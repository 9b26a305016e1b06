"""ModelNet40 preprocessing: build {train,val,test}.pkl pair-source pickles.

Port of ``data/ModelNet/split_data.py``: reads the modelnet40_ply_hdf5_2048
distribution (h5 files with ``data``/``normal``/``label``) and writes the
pickle lists :class:`se3et_tpu.data.datasets.ModelNetPairDataset` consumes.

Usage:
    python scripts/split_modelnet.py --input data/ModelNet/modelnet40_ply_hdf5_2048 \
        --output data/ModelNet
"""

import argparse
import glob
import os.path as osp
import pickle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--val_fraction", type=float, default=0.1)
    args = parser.parse_args()

    import h5py  # optional dependency, only needed for this prep step
    import numpy as np

    def load(split):
        items = []
        for path in sorted(glob.glob(osp.join(args.input, f"ply_data_{split}*.h5"))):
            with h5py.File(path, "r") as f:
                data = np.asarray(f["data"])
                normal = np.asarray(f["normal"]) if "normal" in f else None
                label = np.asarray(f["label"]).reshape(-1)
            for i in range(data.shape[0]):
                items.append(
                    {
                        "points": data[i].astype(np.float32),
                        "normals": None if normal is None else normal[i].astype(np.float32),
                        "label": int(label[i]),
                    }
                )
        return items

    train_items = load("train")
    test_items = load("test")
    num_val = int(len(train_items) * args.val_fraction)
    val_items = train_items[-num_val:]
    train_items = train_items[:-num_val]
    for name, items in (("train", train_items), ("val", val_items), ("test", test_items)):
        with open(osp.join(args.output, f"{name}.pkl"), "wb") as f:
            pickle.dump(items, f)
        print(name, len(items))


if __name__ == "__main__":
    main()
