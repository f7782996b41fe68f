"""Config system tests: CLI parsing, _parent_ inheritance, overrides.

Covers the semantics of reference options.py:16-129.
"""

import os

import pytest

from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.dotdict import DotDict


def test_parse_arguments_syntax():
    opt = config.parse_arguments([
        "--model=barf_inn_llff",
        "--optim.lr=5.e-4",
        "--nerf.fine_sampling",        # bare flag -> True
        "--data.preload!",             # bang -> False
        "--data.root=",                # empty -> None
        "--data.image_size=[120,160]",
        "--max_iter=100",
    ])
    assert opt.model == "barf_inn_llff"
    assert opt.optim.lr == 5e-4
    assert opt.nerf.fine_sampling is True
    assert opt.data.preload is False
    assert opt.data.root is None
    assert opt.data.image_size == [120, 160]
    assert opt.max_iter == 100


def test_parse_arguments_rejects_duplicates():
    with pytest.raises(AssertionError):
        config.parse_arguments(["--a.b=1", "--a.b=2"])


def test_parent_chain_and_overrides():
    # barf_inn_llff -> nerf_inn_llff -> base
    opt = config.load_options("options/barf_inn_llff.yaml")
    # from base.yaml
    assert opt.group == "0_test"
    assert opt.data.llffhold == 8
    # from nerf_inn_llff.yaml (overrides base)
    assert opt.nerf.rand_rays == 2048
    assert opt.nerf.depth.param == "inverse"
    assert opt.max_iter == 200000
    assert opt.optim.lr == 1e-3
    # from barf_inn_llff.yaml itself
    assert opt.optim.lr_pose == 5e-4
    assert opt.inn.real_nvp.d_hidden == 128
    assert opt.inn.real_nvp.multires == 6
    assert opt.warp_latent.embed_dim == 128
    assert opt.warp_latent.enc_type == "l2fbarf"
    # leaf merge must not clobber sibling keys
    assert opt.freq.scalar == 200


def test_all_option_files_load():
    names = [f[:-5] for f in os.listdir(os.path.join(config.OPTIONS_ROOT, "options"))
             if f.endswith(".yaml")]
    assert len(names) >= 21
    for name in names:
        opt = config.load_options("options/{}.yaml".format(name))
        assert "group" in opt, name  # base.yaml reached through the parent chain


def test_unknown_cli_key_raises_noninteractively():
    opt = config.load_options("options/nerf_blender.yaml")
    with pytest.raises(KeyError):
        config.override_options(opt, DotDict({"nope": 1}), key_stack=[], safe_check=True)


def test_set_options_and_process(tmp_path):
    opt_cmd = config.parse_arguments([
        "--model=nerf",
        "--yaml=nerf_blender",
        "--output_root={}".format(tmp_path),
        "--seed=3",
    ])
    opt = config.set_options(opt_cmd)
    assert opt.name == "debug_seed3"
    assert opt.H == 400 and opt.W == 400
    assert os.path.isdir(opt.output_path)
    # save twice: identical options must not raise
    config.save_options_file(opt)
    config.save_options_file(opt)


def test_dotdict_roundtrip():
    d = DotDict({"a": {"b": [1, {"c": 2}]}})
    d.x = {"y": 3}
    assert d.a.b[1].c == 2
    assert d.x.y == 3
    plain = d.to_plain()
    assert isinstance(plain["a"], dict) and not isinstance(plain["a"], DotDict)
