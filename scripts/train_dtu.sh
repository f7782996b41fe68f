#!/bin/bash
# Paper Table-2 runs: INN warp on DTU (per-scan global_alignment weights
# follow reference scripts/train_dtu.sh)
set -e
declare -A GA=( [scan24]=4 [scan37]=4 [scan40]=2 [scan55]=2 [scan63]=3 [scan65]=3 [scan69]=2 [scan83]=3 [scan97]=3 [scan105]=2 [scan106]=3 [scan110]=3 [scan114]=2 [scan118]=3 )
for scan in scan24 scan37 scan40 scan55 scan63 scan65 scan69 scan83 scan97 scan105 scan106 scan110 scan114 scan118; do
    python train.py --model=barf_inn_dtu --yaml=barf_inn_dtu --barf_c2f=[0.1,0.5] \
        --group=barf_dtu_inn --name=$scan --data.scene=$scan \
        --loss_weight.global_alignment=${GA[$scan]} --visdom!
done
