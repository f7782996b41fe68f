#!/bin/bash
set -e
declare -A GA=( [fern]=4 [flower]=4 [fortress]=5 [horns]=4 [leaves]=3 [orchids]=3 [trex]=4 [room]=3 )
for scene in fern flower fortress horns leaves orchids trex room; do
    python evaluate.py --group=inn_llff --name=$scene --model=barf_inn_llff \
        --yaml=barf_inn_llff --barf_c2f=[0.1,0.5] --data.scene=$scene \
        --loss_weight.global_alignment=${GA[$scene]} --resume --optim.test_photo=False
done
