#!/bin/sh
# reference experiments/geotransformer.3dmatch/find_failure_case.sh: sweep snapshots, eval each
for n in $(seq 20 40); do
    python test.py --test_epoch=$n --benchmark=$1
    python eval.py --test_epoch=$n --benchmark=$1 --method=lgr
done
