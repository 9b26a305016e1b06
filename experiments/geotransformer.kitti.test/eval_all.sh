#!/bin/sh
# reference experiments/geotransformer.kitti.test/eval_all.sh
python eval.py --benchmark=3DLoMatch --method=lgr

for n in 5000 2500 1000 500 250; do
    python eval.py --num_corr=$n --benchmark=3DLoMatch --method=ransac
done
