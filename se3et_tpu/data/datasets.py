r"""Registration pair datasets: 3DMatch/3DLoMatch, KITTI odometry, ModelNet.

Numpy-native ports of ``geotransformer/datasets/registration/{threedmatch,
kitti,modelnet}/dataset.py`` — same metadata formats (pickle lists + per-cloud
``.pth``/``.npy`` files) and the same augmentation semantics, without the
torch Dataset machinery.  Each dataset yields dicts with
``ref_points/src_points (N, 3) float32``, ``transform (4, 4)`` and metadata;
the fixed-shape pyramid is built downstream by :mod:`se3et_tpu.data.pipeline`.

``torch`` (CPU) is only imported lazily to read the 3DMatch ``.pth`` fragment
files the reference dataset distribution uses.
"""

from __future__ import annotations

import os.path as osp
import pickle

import numpy as np


# --------------------------------------------------------------------------
# augmentation helpers (ports of utils/pointcloud.py)
# --------------------------------------------------------------------------


def random_sample_rotation(rng: np.random.RandomState, factor: float = 1.0):
    """Random axis, angle in [0, 2*pi*factor] (``pointcloud.py random_sample_rotation``)."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis) + 1e-12
    angle = rng.rand() * 2.0 * np.pi * factor
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def random_sample_rotation_v2(rng: np.random.RandomState):
    """Uniform SO(3) rotation (QR of a Gaussian; ``random_sample_rotation_v2``)."""
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def random_sample_z_rotation(rng: np.random.RandomState):
    angle = rng.rand() * 2.0 * np.pi
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def transform_from_rt(rotation, translation):
    tf = np.eye(4)
    tf[:3, :3] = rotation
    tf[:3, 3] = translation
    return tf


def _apply_pair_rotation_aug(rng, ref_points, src_points, rotation, translation,
                             factor):
    """Rotate one random cloud of the pair, updating the gt transform
    (``threedmatch/dataset.py:83-103``)."""
    aug = random_sample_rotation(rng, factor)
    if rng.rand() > 0.5:
        ref_points = ref_points @ aug.T
        rotation = aug @ rotation
        translation = aug @ translation
    else:
        src_points = src_points @ aug.T
        rotation = rotation @ aug.T
    return ref_points, src_points, rotation, translation


def _rotate_full(rng, ref_points, src_points, rotation, translation, z_only=False):
    """Independent full-SO(3) (or z-axis) rotations of both clouds — the
    ``rotated``/``z_rotated`` equivariance stress modes
    (``threedmatch/dataset.py:129-147``)."""
    sampler = random_sample_z_rotation if z_only else random_sample_rotation_v2
    ref_rot = sampler(rng)
    ref_points = ref_points @ ref_rot.T
    rotation = ref_rot @ rotation
    translation = ref_rot @ translation
    src_rot = sampler(rng)
    src_points = src_points @ src_rot.T
    rotation = rotation @ src_rot.T
    return ref_points, src_points, rotation, translation


# --------------------------------------------------------------------------
# datasets
# --------------------------------------------------------------------------


class ThreeDMatchPairDataset:
    """3DMatch / 3DLoMatch fragment pairs (``threedmatch/dataset.py:19-163``).

    subset in {'train', 'val', '3DMatch', '3DLoMatch'} (plus the toy/small/one
    variants which share the metadata format).
    """

    def __init__(
        self,
        dataset_root,
        subset,
        point_limit=None,
        use_augmentation=False,
        augmentation_noise=0.005,
        augmentation_rotation=1.0,
        overlap_threshold=None,
        rotated=False,
        z_rotated=False,
        seed=0,
    ):
        self.dataset_root = dataset_root
        self.metadata_root = osp.join(dataset_root, "metadata")
        self.data_root = osp.join(dataset_root, "data")
        self.subset = subset
        self.point_limit = point_limit
        self.use_augmentation = use_augmentation
        self.aug_noise = augmentation_noise
        self.aug_rotation = augmentation_rotation
        self.rotated = rotated
        self.z_rotated = z_rotated
        self.rng = np.random.RandomState(seed)

        with open(osp.join(self.metadata_root, f"{subset}.pkl"), "rb") as f:
            self.metadata_list = pickle.load(f)
        if overlap_threshold is not None:
            self.metadata_list = [
                x for x in self.metadata_list if x["overlap"] > overlap_threshold
            ]

    def __len__(self):
        return len(self.metadata_list)

    def _load_point_cloud(self, file_name):
        path = osp.join(self.data_root, file_name)
        if path.endswith(".pth"):
            import torch  # lazy; CPU-only read of the reference data format

            points = torch.load(path, map_location="cpu", weights_only=False)
            points = np.asarray(points, dtype=np.float32)
        else:
            points = np.load(path).astype(np.float32)
        if self.point_limit is not None and points.shape[0] > self.point_limit:
            idx = self.rng.permutation(points.shape[0])[: self.point_limit]
            points = points[idx]
        return points

    def __getitem__(self, index):
        meta = self.metadata_list[index]
        rotation = np.asarray(meta["rotation"], np.float64)
        translation = np.asarray(meta["translation"], np.float64)
        ref_points = self._load_point_cloud(meta["pcd0"])
        src_points = self._load_point_cloud(meta["pcd1"])

        if self.use_augmentation:
            ref_points, src_points, rotation, translation = _apply_pair_rotation_aug(
                self.rng, ref_points, src_points, rotation, translation,
                self.aug_rotation,
            )
            ref_points = ref_points + (
                self.rng.rand(*ref_points.shape) - 0.5
            ) * self.aug_noise
            src_points = src_points + (
                self.rng.rand(*src_points.shape) - 0.5
            ) * self.aug_noise
        if self.rotated or self.z_rotated:
            ref_points, src_points, rotation, translation = _rotate_full(
                self.rng, ref_points, src_points, rotation, translation,
                z_only=self.z_rotated,
            )

        return {
            "scene_name": meta.get("scene_name"),
            "ref_frame": meta.get("frag_id0"),
            "src_frame": meta.get("frag_id1"),
            "overlap": meta.get("overlap"),
            "ref_points": ref_points.astype(np.float32),
            "src_points": src_points.astype(np.float32),
            "transform": transform_from_rt(rotation, translation).astype(np.float32),
        }


class OdometryKittiPairDataset:
    """KITTI odometry pairs from downsampled ``.npy`` clouds
    (``kitti/dataset.py:16-130``)."""

    DATA_SPLIT = {
        "train": ["00", "01", "02", "03", "04", "05"],
        "val": ["06", "07"],
        "test": ["08", "09", "10"],
    }

    def __init__(
        self,
        dataset_root,
        subset,
        point_limit=None,
        use_augmentation=False,
        augmentation_noise=0.01,
        augmentation_min_scale=0.8,
        augmentation_max_scale=1.2,
        augmentation_shift=2.0,
        augmentation_rotation=1.0,
        seed=0,
    ):
        self.dataset_root = dataset_root
        self.subset = subset
        self.point_limit = point_limit
        self.use_augmentation = use_augmentation
        self.aug_noise = augmentation_noise
        self.aug_min_scale = augmentation_min_scale
        self.aug_max_scale = augmentation_max_scale
        self.aug_shift = augmentation_shift
        self.aug_rotation = augmentation_rotation
        self.rng = np.random.RandomState(seed)
        with open(osp.join(dataset_root, "metadata", f"{subset}.pkl"), "rb") as f:
            self.metadata = pickle.load(f)

    def __len__(self):
        return len(self.metadata)

    def _load_point_cloud(self, file_name):
        points = np.load(osp.join(self.dataset_root, file_name)).astype(np.float32)
        if self.point_limit is not None and points.shape[0] > self.point_limit:
            idx = self.rng.permutation(points.shape[0])[: self.point_limit]
            points = points[idx]
        return points

    def _augment(self, ref_points, src_points, transform):
        rng = self.rng
        rotation = transform[:3, :3]
        translation = transform[:3, 3]
        ref_points = ref_points + (rng.rand(*ref_points.shape) - 0.5) * self.aug_noise
        src_points = src_points + (rng.rand(*src_points.shape) - 0.5) * self.aug_noise
        ref_points, src_points, rotation, translation = _apply_pair_rotation_aug(
            rng, ref_points, src_points, rotation, translation, self.aug_rotation
        )
        scale = self.aug_min_scale + (self.aug_max_scale - self.aug_min_scale) * rng.rand()
        ref_points, src_points = ref_points * scale, src_points * scale
        translation = translation * scale
        ref_shift = rng.uniform(-self.aug_shift, self.aug_shift, 3)
        src_shift = rng.uniform(-self.aug_shift, self.aug_shift, 3)
        ref_points = ref_points + ref_shift
        src_points = src_points + src_shift
        translation = -(src_shift[None] @ rotation.T)[0] + translation + ref_shift
        return ref_points, src_points, transform_from_rt(rotation, translation)

    def __getitem__(self, index):
        meta = self.metadata[index]
        ref_points = self._load_point_cloud(meta["pcd0"])
        src_points = self._load_point_cloud(meta["pcd1"])
        transform = np.asarray(meta["transform"], np.float64)
        if self.use_augmentation:
            ref_points, src_points, transform = self._augment(
                ref_points, src_points, transform
            )
        return {
            "seq_id": meta.get("seq_id"),
            "ref_frame": meta.get("frame0"),
            "src_frame": meta.get("frame1"),
            "ref_points": ref_points.astype(np.float32),
            "src_points": src_points.astype(np.float32),
            "transform": transform.astype(np.float32),
        }


class OdometryKittiPairTestDataset(OdometryKittiPairDataset):
    """KITTI odometry pairs rescaled x0.1 to 3DMatch scale, for cross-dataset
    generalization tests of 3DMatch-trained models
    (``kitti_test/dataset.py:16-129``): keep only returns within 30 m of the
    sensor, random-subsample to ``point_limit``, scale points and the gt
    translation by 0.1."""

    SCALE = 0.1
    NEAR_RANGE = 30.0

    def _load_point_cloud(self, file_name):
        points = np.load(osp.join(self.dataset_root, file_name)).astype(np.float32)
        if self.point_limit is not None and points.shape[0] > self.point_limit:
            close = points[np.linalg.norm(points, axis=1) < self.NEAR_RANGE]
            idx = self.rng.permutation(close.shape[0])[: self.point_limit]
            points = close[idx]
        # the reference scales inside the subsample branch only
        # (kitti_test/dataset.py:89-94) — a latent inconsistency that never
        # fires because KITTI clouds always exceed the limit; scale always.
        return self.SCALE * points

    def __getitem__(self, index):
        meta = self.metadata[index]
        ref_points = self._load_point_cloud(meta["pcd0"])
        src_points = self._load_point_cloud(meta["pcd1"])
        transform = np.asarray(meta["transform"], np.float64).copy()
        transform[:3, 3] = transform[:3, 3] * self.SCALE  # match 3DMatch scale
        if self.use_augmentation:
            ref_points, src_points, transform = self._augment(
                ref_points, src_points, transform
            )
        return {
            "seq_id": meta.get("seq_id"),
            "ref_frame": meta.get("frame0"),
            "src_frame": meta.get("frame1"),
            "ref_points": ref_points.astype(np.float32),
            "src_points": src_points.astype(np.float32),
            "transform": transform.astype(np.float32),
        }


class ModelNetPairDataset:
    """ModelNet40 crop/transform pairs for generalization tests.

    Port of ``modelnet/dataset.py:24-240``: normalize a mesh-sampled cloud,
    duplicate it, apply a random limited-magnitude rigid transform to the src
    copy, random-plane-crop both sides to ``keep_ratio``, optionally jitter.
    Data format: ``<root>/<subset>.pkl`` — list of dicts with ``points``,
    ``normals``, ``label``.
    """

    ALL_CATEGORIES = 40

    def __init__(
        self,
        dataset_root,
        subset,
        num_points=1024,
        rotation_magnitude=45.0,
        translation_magnitude=0.5,
        noise_magnitude=None,
        keep_ratio=0.7,
        deterministic=False,
        seed=0,
    ):
        import pickle as _pickle

        with open(osp.join(dataset_root, f"{subset}.pkl"), "rb") as f:
            self.data_list = _pickle.load(f)
        self.num_points = num_points
        self.rotation_magnitude = rotation_magnitude
        self.translation_magnitude = translation_magnitude
        self.noise_magnitude = noise_magnitude
        self.keep_ratio = keep_ratio
        self.deterministic = deterministic
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.data_list)

    def _crop_plane(self, rng, points):
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal) + 1e-12
        dist = points @ normal
        thresh = np.percentile(dist, (1.0 - self.keep_ratio) * 100.0)
        return points[dist >= thresh]

    def __getitem__(self, index):
        rng = np.random.RandomState(index) if self.deterministic else self.rng
        item = self.data_list[index]
        points = np.asarray(item["points"], np.float32)
        # normalize to unit sphere
        points = points - points.mean(axis=0)
        points = points / (np.linalg.norm(points, axis=1).max() + 1e-12)
        if points.shape[0] > self.num_points:
            sel = rng.permutation(points.shape[0])[: self.num_points]
            points = points[sel]

        ref_points = points.copy()
        # limited-magnitude random transform
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis) + 1e-12
        angle = np.radians(rng.uniform(0, self.rotation_magnitude))
        k = np.array(
            [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
        )
        rotation = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
        translation = rng.uniform(
            -self.translation_magnitude, self.translation_magnitude, 3
        )
        transform = transform_from_rt(rotation, translation)
        # src = inv(transform) applied to ref
        src_points = (ref_points - translation) @ rotation

        ref_points = self._crop_plane(rng, ref_points)
        src_points = self._crop_plane(rng, src_points)
        if self.noise_magnitude is not None:
            ref_points = ref_points + np.clip(
                0.01 * rng.normal(size=ref_points.shape),
                -self.noise_magnitude, self.noise_magnitude,
            )
            src_points = src_points + np.clip(
                0.01 * rng.normal(size=src_points.shape),
                -self.noise_magnitude, self.noise_magnitude,
            )
        return {
            "label": item.get("label"),
            "ref_points": ref_points.astype(np.float32),
            "src_points": src_points.astype(np.float32),
            "transform": transform.astype(np.float32),
        }


class SyntheticPairDataset:
    """Procedural registration pairs for tests, demos and benchmarking when the
    real datasets are not on disk.  Generates partially-overlapping fragments
    of a structured scene (random planes + blobs) with a random rigid motion —
    the same interface as the real datasets."""

    def __init__(self, num_pairs=16, num_points=5000, overlap=0.7, noise=0.002,
                 extent=2.0, seed=0, rotated=True):
        self.num_pairs = num_pairs
        self.num_points = num_points
        self.overlap = overlap
        self.noise = noise
        self.extent = extent
        self.seed = seed
        self.rotated = rotated

    def __len__(self):
        return self.num_pairs

    def __getitem__(self, index):
        rng = np.random.RandomState(self.seed + index)
        # structured scene: a few planes and gaussian clusters.  Feature sizes
        # scale with ``extent`` (plane half-size extent/2, blob sigma
        # extent/8) so the scene is a pure rescaling of the extent-2 case —
        # identical to the historical generator at extent=2.0, and a sane
        # LiDAR-scale proxy at extent=20 (fixed-size 2 m features there would
        # collapse the KITTI voxel pyramid to a handful of points).
        pts = []
        for _ in range(4):
            origin = rng.uniform(-self.extent, self.extent, 3)
            basis = np.linalg.qr(rng.normal(size=(3, 3)))[0][:, :2]
            uv = rng.uniform(-self.extent / 2, self.extent / 2,
                             size=(self.num_points // 6, 2))
            pts.append(origin + uv @ basis.T)
        for _ in range(4):
            center = rng.uniform(-self.extent, self.extent, 3)
            pts.append(center + rng.normal(scale=self.extent / 8,
                                           size=(self.num_points // 12, 3)))
        cloud = np.concatenate(pts, 0)
        rng.shuffle(cloud)

        # two overlapping crops along a random direction
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        proj = cloud @ d
        lo, hi = np.percentile(proj, [5, 95])
        split = lo + (hi - lo) * (1.0 - self.overlap)
        ref = cloud[proj >= split][: self.num_points]
        src = cloud[proj <= hi - (hi - lo) * (1.0 - self.overlap)][: self.num_points]

        rotation = (
            random_sample_rotation_v2(rng) if self.rotated else np.eye(3)
        )
        translation = rng.uniform(-0.5, 0.5, 3)
        src = (src - translation) @ rotation  # src = R^T (ref_region - t)
        ref = ref + rng.normal(scale=self.noise, size=ref.shape)
        src = src + rng.normal(scale=self.noise, size=src.shape)
        return {
            "scene_name": f"synthetic_{index}",
            "ref_points": ref.astype(np.float32),
            "src_points": src.astype(np.float32),
            "transform": transform_from_rt(rotation, translation).astype(np.float32),
        }
