#!/bin/sh
# reference experiments/se3eti2.3dmatch/eval.sh
python eval.py --benchmark=3DMatch --method=lgr

for n in 5000 2500 1000 500 250; do
    python eval.py --num_corr=$n --benchmark=3DMatch --method=ransac
done
