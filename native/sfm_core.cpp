// Native SfM geometry core for the pose-initialization subsystem.
//
// The reference delegates reconstruction to pycolmap (an external C++
// process; reference utils/colmap_initialization/
// reconstruction_know_intrinsics_for_hloc.py). This library is the
// in-process equivalent of the hot host-side geometry: RANSAC 8-point
// essential estimation, DLT triangulation, and RANSAC linear PnP — the
// O(pairs * iters) inner loops that dominate CPU time at DTU scale
// (49 images -> 1176 pairs). The Python layer (utils/sfm.py) keeps a
// numpy fallback with identical contracts; parity is tested in
// tests/test_sfm_native.py.
//
// Self-contained: cyclic Jacobi eigensolver for the small symmetric
// systems (<=12x12), no LAPACK/Eigen dependency. C ABI for ctypes.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

// ----------------------------------------------------------------- linalg

// Cyclic Jacobi eigendecomposition of symmetric A (n x n, row-major).
// On return: d holds eigenvalues, V columns hold eigenvectors (A V = V d).
void jacobi_eigen(double* A, int n, double* V, double* d) {
    for (int i = 0; i < n * n; ++i) V[i] = 0.0;
    for (int i = 0; i < n; ++i) V[i * n + i] = 1.0;
    for (int sweep = 0; sweep < 64; ++sweep) {
        double off = 0.0;
        for (int p = 0; p < n; ++p)
            for (int q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
        if (off < 1e-24) break;
        for (int p = 0; p < n; ++p) {
            for (int q = p + 1; q < n; ++q) {
                double apq = A[p * n + q];
                if (std::fabs(apq) < 1e-300) continue;
                double app = A[p * n + p], aqq = A[q * n + q];
                double theta = 0.5 * (aqq - app) / apq;
                double t = (theta >= 0 ? 1.0 : -1.0) /
                           (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
                double c = 1.0 / std::sqrt(t * t + 1.0);
                double s = t * c;
                for (int k = 0; k < n; ++k) {
                    double akp = A[k * n + p], akq = A[k * n + q];
                    A[k * n + p] = c * akp - s * akq;
                    A[k * n + q] = s * akp + c * akq;
                }
                for (int k = 0; k < n; ++k) {
                    double apk = A[p * n + k], aqk = A[q * n + k];
                    A[p * n + k] = c * apk - s * aqk;
                    A[q * n + k] = s * apk + c * aqk;
                }
                for (int k = 0; k < n; ++k) {
                    double vkp = V[k * n + p], vkq = V[k * n + q];
                    V[k * n + p] = c * vkp - s * vkq;
                    V[k * n + q] = s * vkp + c * vkq;
                }
            }
        }
    }
    for (int i = 0; i < n; ++i) d[i] = A[i * n + i];
}

// Smallest-eigenvalue eigenvector of symmetric AtA (n x n) -> v (n).
void min_eigvec(double* AtA, int n, double* v) {
    double V[12 * 12], d[12];
    jacobi_eigen(AtA, n, V, d);
    int best = 0;
    for (int i = 1; i < n; ++i)
        if (d[i] < d[best]) best = i;
    for (int i = 0; i < n; ++i) v[i] = V[i * n + best];
}

void cross3(const double a[3], const double b[3], double out[3]) {
    out[0] = a[1] * b[2] - a[2] * b[1];
    out[1] = a[2] * b[0] - a[0] * b[2];
    out[2] = a[0] * b[1] - a[1] * b[0];
}

double norm3(const double a[3]) {
    return std::sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2]);
}

// SVD of a 3x3 matrix M = U diag(S) Vt via eigen of MtM; U completed by
// cross products for (near-)rank-deficient inputs.
void svd3(const double* M, double* U, double* S, double* Vt) {
    double MtM[9];
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += M[k * 3 + i] * M[k * 3 + j];
            MtM[i * 3 + j] = s;
        }
    double V[9], d[3];
    jacobi_eigen(MtM, 3, V, d);
    // sort eigenvalues descending
    int ord[3] = {0, 1, 2};
    for (int i = 0; i < 3; ++i)
        for (int j = i + 1; j < 3; ++j)
            if (d[ord[j]] > d[ord[i]]) { int t = ord[i]; ord[i] = ord[j]; ord[j] = t; }
    double Vs[9];
    for (int c = 0; c < 3; ++c)
        for (int r = 0; r < 3; ++r) Vs[r * 3 + c] = V[r * 3 + ord[c]];
    for (int c = 0; c < 3; ++c) S[c] = std::sqrt(std::max(d[ord[c]], 0.0));
    // U columns = M v / s; a RELATIVE threshold decides when a singular
    // value is numerically zero (essential matrices have spectrum (1,1,0)
    // where the Jacobi residual for s3 is ~1e-9 * s1 — dividing by it
    // produces a garbage non-unit column), completed by cross product
    double Ucol[3][3];
    double s_ref = S[0] > 1e-300 ? S[0] : 1e-300;
    for (int c = 0; c < 3; ++c) {
        double mv[3] = {0, 0, 0};
        for (int r = 0; r < 3; ++r)
            for (int k = 0; k < 3; ++k) mv[r] += M[r * 3 + k] * Vs[k * 3 + c];
        double s = S[c];
        if (s > 1e-7 * s_ref) {
            for (int r = 0; r < 3; ++r) Ucol[c][r] = mv[r] / s;
            double n = norm3(Ucol[c]);
            if (n > 1e-12)
                for (int r = 0; r < 3; ++r) Ucol[c][r] /= n;
        } else if (c == 2) {
            cross3(Ucol[0], Ucol[1], Ucol[2]);
            double n = norm3(Ucol[2]);
            for (int r = 0; r < 3; ++r) Ucol[2][r] /= (n > 1e-12 ? n : 1.0);
        } else {
            for (int r = 0; r < 3; ++r) Ucol[c][r] = (r == c) ? 1.0 : 0.0;
        }
    }
    for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) {
            U[r * 3 + c] = Ucol[c][r];
            Vt[r * 3 + c] = Vs[c * 3 + r];
        }
}

double det3(const double* M) {
    return M[0] * (M[4] * M[8] - M[5] * M[7])
         - M[1] * (M[3] * M[8] - M[5] * M[6])
         + M[2] * (M[3] * M[7] - M[4] * M[6]);
}

// xorshift PRNG (deterministic, seedable)
struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed * 6364136223846793005ULL + 1442695040888963407ULL) {}
    uint32_t next() {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        return (uint32_t)(s >> 32);
    }
    int uniform(int n) { return (int)(next() % (uint32_t)n); }
};

// sample k distinct indices in [0, n)
void sample_k(Rng& rng, int n, int k, int* out) {
    for (int i = 0; i < k; ++i) {
        bool dup;
        do {
            out[i] = rng.uniform(n);
            dup = false;
            for (int j = 0; j < i; ++j)
                if (out[j] == out[i]) { dup = true; break; }
        } while (dup);
    }
}

// ----------------------------------------------------------- essential

// 8-point essential from index subset; E row-major. x1/x2: [n,2].
void essential_from_points(const double* x1, const double* x2,
                           const int* idx, int m, double* E) {
    double AtA[81];
    std::memset(AtA, 0, sizeof(AtA));
    for (int s = 0; s < m; ++s) {
        int i = idx ? idx[s] : s;
        double u1 = x1[2 * i], v1 = x1[2 * i + 1];
        double u2 = x2[2 * i], v2 = x2[2 * i + 1];
        double row[9] = {u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, 1.0};
        for (int a = 0; a < 9; ++a)
            for (int b = 0; b < 9; ++b) AtA[a * 9 + b] += row[a] * row[b];
    }
    double e[9];
    min_eigvec(AtA, 9, e);
    // project onto the essential manifold: singular values (1,1,0)
    double U[9], S[3], Vt[9];
    svd3(e, U, S, Vt);
    for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c)
            E[r * 3 + c] = U[r * 3 + 0] * Vt[0 * 3 + c]
                         + U[r * 3 + 1] * Vt[1 * 3 + c];
}

double sampson(const double* E, const double* x1, const double* x2, int i) {
    double h1[3] = {x1[2 * i], x1[2 * i + 1], 1.0};
    double h2[3] = {x2[2 * i], x2[2 * i + 1], 1.0};
    double Ex1[3], Etx2[3];
    for (int r = 0; r < 3; ++r) {
        Ex1[r] = E[r * 3] * h1[0] + E[r * 3 + 1] * h1[1] + E[r * 3 + 2] * h1[2];
        Etx2[r] = E[r] * h2[0] + E[3 + r] * h2[1] + E[6 + r] * h2[2];
    }
    double num = h2[0] * Ex1[0] + h2[1] * Ex1[1] + h2[2] * Ex1[2];
    num *= num;
    double den = Ex1[0] * Ex1[0] + Ex1[1] * Ex1[1]
               + Etx2[0] * Etx2[0] + Etx2[1] * Etx2[1];
    return num / (den > 1e-12 ? den : 1e-12);
}

// ------------------------------------------------------------------ DLT

void triangulate_one(const double* P1, const double* P2,
                     const double* u1, const double* u2, double* X) {
    double A[16];
    for (int c = 0; c < 4; ++c) {
        A[0 * 4 + c] = u1[0] * P1[2 * 4 + c] - P1[0 * 4 + c];
        A[1 * 4 + c] = u1[1] * P1[2 * 4 + c] - P1[1 * 4 + c];
        A[2 * 4 + c] = u2[0] * P2[2 * 4 + c] - P2[0 * 4 + c];
        A[3 * 4 + c] = u2[1] * P2[2 * 4 + c] - P2[1 * 4 + c];
    }
    double AtA[16];
    std::memset(AtA, 0, sizeof(AtA));
    for (int r = 0; r < 4; ++r)
        for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b) AtA[a * 4 + b] += A[r * 4 + a] * A[r * 4 + b];
    double v[4];
    min_eigvec(AtA, 4, v);
    double w = (std::fabs(v[3]) > 1e-12) ? v[3] : 1e-12;
    X[0] = v[0] / w; X[1] = v[1] / w; X[2] = v[2] / w;
}

// linear PnP (DLT for P, then orthogonalize R). X: [n,3] world, x: [n,2]
// normalized. P_out: [3,4] w2c. Uses indices idx[0..m).
void pnp_from_points(const double* X, const double* x, const int* idx, int m,
                     double* P_out) {
    double AtA[144];
    std::memset(AtA, 0, sizeof(AtA));
    for (int s = 0; s < m; ++s) {
        int i = idx ? idx[s] : s;
        double Xh[4] = {X[3 * i], X[3 * i + 1], X[3 * i + 2], 1.0};
        double row0[12], row1[12];
        std::memset(row0, 0, sizeof(row0));
        std::memset(row1, 0, sizeof(row1));
        for (int k = 0; k < 4; ++k) {
            row0[k] = Xh[k];
            row0[8 + k] = -x[2 * i] * Xh[k];
            row1[4 + k] = Xh[k];
            row1[8 + k] = -x[2 * i + 1] * Xh[k];
        }
        for (int a = 0; a < 12; ++a)
            for (int b = 0; b < 12; ++b)
                AtA[a * 12 + b] += row0[a] * row0[b] + row1[a] * row1[b];
    }
    double p[12];
    min_eigvec(AtA, 12, p);
    // sign: median depth positive (approximate with mean here)
    double zsum = 0;
    for (int s = 0; s < m; ++s) {
        int i = idx ? idx[s] : s;
        zsum += p[8] * X[3 * i] + p[9] * X[3 * i + 1] + p[10] * X[3 * i + 2] + p[11];
    }
    if (zsum < 0)
        for (int k = 0; k < 12; ++k) p[k] = -p[k];
    double M[9] = {p[0], p[1], p[2], p[4], p[5], p[6], p[8], p[9], p[10]};
    double U[9], S[3], Vt[9], R[9];
    svd3(M, U, S, Vt);
    for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += U[r * 3 + k] * Vt[k * 3 + c];
            R[r * 3 + c] = s;
        }
    double scale = (S[0] + S[1] + S[2]) / 3.0;
    if (det3(R) < 0) {
        for (int k = 0; k < 9; ++k) R[k] = -R[k];
        scale = -scale;
    }
    double t[3] = {p[3] / scale, p[7] / scale, p[11] / scale};
    for (int r = 0; r < 3; ++r) {
        for (int c = 0; c < 3; ++c) P_out[r * 4 + c] = R[r * 3 + c];
        P_out[r * 4 + 3] = t[r];
    }
}

double reproj_err(const double* P, const double* X, const double* x, int i,
                  double* z_out) {
    double Xc[3];
    for (int r = 0; r < 3; ++r)
        Xc[r] = P[r * 4] * X[3 * i] + P[r * 4 + 1] * X[3 * i + 1]
              + P[r * 4 + 2] * X[3 * i + 2] + P[r * 4 + 3];
    double z = Xc[2] > 1e-9 ? Xc[2] : 1e-9;
    double du = Xc[0] / z - x[2 * i], dv = Xc[1] / z - x[2 * i + 1];
    if (z_out) *z_out = Xc[2];
    return std::sqrt(du * du + dv * dv);
}

}  // namespace

extern "C" {

// exported for tests: SVD of a 3x3 (row-major)
void niw_svd3(const double* M, double* U, double* S, double* Vt) {
    svd3(M, U, S, Vt);
}

// RANSAC 8-point essential. Returns inlier count (0 on failure).
int niw_ransac_essential(const double* x1, const double* x2, int n,
                         double thresh, int iters, uint64_t seed,
                         double* E_out, uint8_t* inliers_out) {
    if (n < 8) return 0;
    Rng rng(seed + 1);
    double best_E[9];
    int best_n = 0;
    double t2 = thresh * thresh;
    int idx[8];
    double E[9];
    for (int it = 0; it < iters; ++it) {
        sample_k(rng, n, 8, idx);
        essential_from_points(x1, x2, idx, 8, E);
        int cnt = 0;
        for (int i = 0; i < n; ++i)
            if (sampson(E, x1, x2, i) < t2) ++cnt;
        if (cnt > best_n) {
            best_n = cnt;
            std::memcpy(best_E, E, sizeof(E));
        }
    }
    if (best_n < 8) return 0;
    // refit on inliers
    int* inl_idx = new int[best_n];
    int m = 0;
    for (int i = 0; i < n; ++i)
        if (sampson(best_E, x1, x2, i) < t2) inl_idx[m++] = i;
    essential_from_points(x1, x2, inl_idx, m, E_out);
    delete[] inl_idx;
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
        bool in = sampson(E_out, x1, x2, i) < t2;
        inliers_out[i] = in ? 1 : 0;
        if (in) ++cnt;
    }
    return cnt;
}

// Triangulate n correspondences. P1/P2: [3,4] row-major, x: [n,2], X: [n,3].
void niw_triangulate(const double* P1, const double* P2, const double* x1,
                     const double* x2, int n, double* X_out) {
    for (int i = 0; i < n; ++i)
        triangulate_one(P1, P2, x1 + 2 * i, x2 + 2 * i, X_out + 3 * i);
}

// Decompose E into the cheirality-best [R|t] of camera 2 (camera 1 = I).
// Returns number of points in front of both cameras for the winner.
int niw_pose_from_essential(const double* E, const double* x1,
                            const double* x2, int n, double* P2_out) {
    double U[9], S[3], Vt[9];
    svd3(E, U, S, Vt);
    if (det3(U) < 0)
        for (int k = 0; k < 9; ++k) U[k] = -U[k];
    if (det3(Vt) < 0)
        for (int k = 0; k < 9; ++k) Vt[k] = -Vt[k];
    double W[9] = {0, -1, 0, 1, 0, 0, 0, 0, 1};
    double P1[12] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0};
    int best_n = -1;
    for (int ri = 0; ri < 2; ++ri) {
        double R[9];
        // R = U * (ri ? W^T : W) * Vt
        double UW[9];
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c) {
                double s = 0;
                for (int k = 0; k < 3; ++k) {
                    double w = ri ? W[c * 3 + k] : W[k * 3 + c];
                    s += U[r * 3 + k] * w;
                }
                UW[r * 3 + c] = s;
            }
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c) {
                double s = 0;
                for (int k = 0; k < 3; ++k) s += UW[r * 3 + k] * Vt[k * 3 + c];
                R[r * 3 + c] = s;
            }
        for (int ti = 0; ti < 2; ++ti) {
            double P2[12];
            for (int r = 0; r < 3; ++r) {
                for (int c = 0; c < 3; ++c) P2[r * 4 + c] = R[r * 3 + c];
                P2[r * 4 + 3] = (ti ? -1.0 : 1.0) * U[r * 3 + 2];
            }
            int cnt = 0;
            for (int i = 0; i < n; ++i) {
                double X[3];
                triangulate_one(P1, P2, x1 + 2 * i, x2 + 2 * i, X);
                double z1 = X[2];
                double z2 = P2[8] * X[0] + P2[9] * X[1] + P2[10] * X[2] + P2[11];
                if (z1 > 0 && z2 > 0) ++cnt;
            }
            if (cnt > best_n) {
                best_n = cnt;
                std::memcpy(P2_out, P2, sizeof(P2));
            }
        }
    }
    return best_n;
}

// RANSAC linear PnP. Returns inlier count (0 on failure).
int niw_ransac_pnp(const double* X, const double* x, int n, double thresh,
                   int iters, uint64_t seed, double* P_out,
                   uint8_t* inliers_out) {
    if (n < 6) return 0;
    Rng rng(seed + 7);
    double best_P[12];
    int best_n = 0;
    int idx[6];
    double P[12];
    for (int it = 0; it < iters; ++it) {
        sample_k(rng, n, 6, idx);
        pnp_from_points(X, x, idx, 6, P);
        int cnt = 0;
        for (int i = 0; i < n; ++i) {
            double z;
            if (reproj_err(P, X, x, i, &z) < thresh && z > 0) ++cnt;
        }
        if (cnt > best_n) {
            best_n = cnt;
            std::memcpy(best_P, P, sizeof(P));
        }
    }
    if (best_n < 6) return 0;
    int* inl = new int[best_n];
    int m = 0;
    for (int i = 0; i < n; ++i) {
        double z;
        if (reproj_err(best_P, X, x, i, &z) < thresh && z > 0) inl[m++] = i;
    }
    pnp_from_points(X, x, inl, m, P_out);
    delete[] inl;
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
        double z;
        bool in = reproj_err(P_out, X, x, i, &z) < thresh && z > 0;
        inliers_out[i] = in ? 1 : 0;
        if (in) ++cnt;
    }
    return cnt;
}

}  // extern "C"
