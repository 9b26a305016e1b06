r"""Host-side precompute of kernel-point influence weights.

Influence weights are *pure geometry*: ``w[n, h, k] = f_sigma(|nbr - q -
kernel_point_k|)`` depends only on point coordinates, the (fixed) kernel
dispositions, and the per-stage radius/sigma schedule — never on parameters.
Like the point-to-node partition (round 2), they therefore belong on the
host data path, not the device: precomputing them

* removes every influence kernel from the serving graph (~17-33 ms/pair of
  the backbone section, BENCH.md), and from the train step;
* is *more exact* than the fused device path (fp32 host math vs the
  double-bf16 coordinate windows' ~2^-18 relative reconstruction noise);
* pipelines with device compute in serving (host builds pair i+1's
  geometry while the chip runs pair i).

Cost: ~50 MB/pair extra HBM at production 3DMatch shapes (bf16 on the
wire, cast to the compute dtype on device) and ~0.5 s/pair of vectorized
numpy (amortized across loader workers).

Mirrors ``nn/epn._influence_weights`` (reference ``blocks_epn.py:341-366``)
and both backbones' shared radius schedule: same-level sets at
``(2^(st-1)) * 2 * init`` (stage 0: ``init``), strided sets at
``2^(st-1) * init``.
"""

from __future__ import annotations

import numpy as np

from se3et_tpu.core import kernel_points as kp_lib


def _kernel_points_for(model_cfg, radius: float) -> np.ndarray:
    epn = model_cfg.epn
    if model_cfg.backbone != "e2pn" or epn.kanchor == 1:
        return kp_lib.load_kernels(
            radius, model_cfg.kernel_size, dimension=3, fixed="center",
            equiv_mode=True,
        )
    if epn.fixed_kernel_points == "verticals":
        return kp_lib.so2_symmetric_kernel_points(
            radius, epn.num_kernel_points, epn.kanchor * epn.quotient_factor
        )
    return kp_lib.equivariant_kernel_points(
        radius, epn.num_kernel_points, epn.kanchor, epn.quotient_factor
    )


def _influence_np(q_points, s_points, neighbor_indices, kernel_points, sigma,
                  mode: str) -> np.ndarray:
    """Numpy mirror of ``nn/epn._influence_weights`` (fp32, batched).

    Host-throughput-tuned (measured 6.8x on the production stage-0 set):
    the kernel-point contraction goes through BLAS (``rel @ kp^T`` instead of
    a strided einsum), |rel|^2 through a self-einsum (no squared temp), and
    the influence chain mutates ``sq`` in place — at 20k x 24 x 15 elements
    per set the original allocated ~6 full-size temporaries.
    """
    kernel_points = np.ascontiguousarray(kernel_points, np.float32)
    num_s = s_points.shape[1]
    safe = np.clip(neighbor_indices, 0, num_s - 1)
    b = q_points.shape[0]
    nbr = np.stack([s_points[i][safe[i]] for i in range(b)])  # (B, Nq, H, 3)
    valid = neighbor_indices < num_s
    rel = nbr - q_points[:, :, None, :]
    rel2 = np.einsum("bnhc,bnhc->bnh", rel, rel)[..., None]
    cross = (rel.reshape(-1, 3) @ kernel_points.T).reshape(
        rel.shape[:3] + (kernel_points.shape[0],)
    )
    kp2 = np.sum(kernel_points**2, axis=-1, dtype=np.float32)
    cross *= np.float32(-2.0)
    cross += rel2
    cross += kp2
    sq = cross  # (B, Nq, H, K), renamed: |rel - kp|^2, mutated in place
    np.maximum(sq, 0.0, out=sq)
    if mode == "linear":
        np.sqrt(sq, out=sq)
        sq *= np.float32(-1.0 / sigma)
        sq += np.float32(1.0)
        np.maximum(sq, 0.0, out=sq)
        w = sq
    elif mode == "constant":
        w = np.ones_like(sq)
    elif mode == "gaussian":
        sig2 = (sigma * 0.3) ** 2
        sq *= np.float32(-1.0 / (2.0 * sig2))
        w = np.exp(sq, out=sq)
    else:
        raise ValueError(mode)
    w *= valid[..., None]
    # pad H to the conv kernel's chunk multiple (pick_hc) with zeros HERE — a
    # device-side pad of the (B, N, H, K) tensor relayouts ~1.3 ms/pair —
    # and emit bf16 directly (the serving compute dtype; an f16 parameter
    # costs a cast + layout copy on device)
    import ml_dtypes

    from se3et_tpu.ops.pallas.windowed_conv import pick_hc

    h = w.shape[2]
    hc = pick_hc(h)
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        w = np.pad(w, ((0, 0), (0, 0), (0, h_pad - h), (0, 0)))
    return w.astype(ml_dtypes.bfloat16)


def influence_signature(model_cfg) -> np.ndarray:
    """8-byte uint8 signature of every config facet influence values depend
    on: backbone family, stage count, radius/sigma schedule, influence mode,
    and the kernel-point disposition parameters.  Stamped on pyramid dicts by
    :func:`precompute_influence` and checked by :func:`verify_influence`
    before a model consumes host-precomputed tensors — shape coincidence
    alone (advisor r3) must not be enough to accept foreign influence data.
    """
    import hashlib

    if model_cfg.backbone == "e2pn":
        epn = model_cfg.epn
        kp_desc = (
            epn.num_kernel_points, epn.kanchor, epn.quotient_factor,
            epn.fixed_kernel_points, epn.kp_influence,
        )
    else:
        kp_desc = (model_cfg.kernel_size, "linear")
    desc = repr((
        model_cfg.backbone, model_cfg.num_stages,
        round(float(model_cfg.init_radius), 9),
        round(float(model_cfg.init_sigma), 9), kp_desc,
    ))
    dig = hashlib.sha1(desc.encode()).digest()[:8]
    return np.frombuffer(dig, np.uint8).copy()


def verify_influence(data: dict, model_cfg, logger=None) -> dict:
    """Host-side guard: strip precomputed influence tensors whose config
    signature does not match ``model_cfg``.

    Runs OUTSIDE jit (signatures are array values, invisible at trace time);
    engine entry points call it on the numpy pyramid before feeding the
    model.  A stripped dict is still valid — the backbone recomputes
    influence in-graph, just slower.  Returns ``data`` (mutated).
    """
    keys = [k for k in data if k.startswith("influence_") and k != "influence_sig"]
    if not keys:
        return data
    sig = np.asarray(data.get("influence_sig", np.zeros(0, np.uint8)))
    expect = influence_signature(model_cfg)
    if sig.shape == expect.shape and np.array_equal(sig, expect):
        return data
    msg = (
        "precomputed influence tensors carry a different config signature "
        "than this model (sigma schedule / kernel disposition / influence "
        "mode mismatch); dropping them — the backbone will recompute "
        "influence in-graph"
    )
    if logger is not None:
        logger.warning(msg)
    else:
        import warnings

        warnings.warn(msg, stacklevel=2)
    for k in keys + (["influence_sig"] if "influence_sig" in data else []):
        del data[k]
    return data


def precompute_influence(data: dict, model_cfg) -> dict:
    """Add ``influence_same_{st}`` / ``influence_sub_{st}`` (B, Nq, H, K)
    bf16 arrays to a pyramid dict for every conv neighbor set of
    ``model_cfg``'s backbone, plus the ``influence_sig`` config stamp
    checked by :func:`verify_influence`.  Returns ``data`` (mutated)."""
    if model_cfg.backbone not in ("e2pn", "kpconv"):
        return data
    r0, s0 = model_cfg.init_radius, model_cfg.init_sigma
    mode = model_cfg.epn.kp_influence if model_cfg.backbone == "e2pn" else "linear"
    num_stages = model_cfg.num_stages
    pts = [np.asarray(data[f"points_{i}"], np.float32)
           for i in range(num_stages)]

    def one(radius, sigma, q, sup, idx):
        return _influence_np(
            q, sup, np.asarray(idx), _kernel_points_for(model_cfg, radius),
            sigma, mode,
        )

    data["influence_same_0"] = one(r0, s0, pts[0], pts[0], data["neighbors_0"])
    for st in range(1, num_stages):
        mult = 2 ** (st - 1)
        data[f"influence_sub_{st}"] = one(
            r0 * mult, s0 * mult, pts[st], pts[st - 1],
            data[f"subsampling_{st - 1}"],
        )
        data[f"influence_same_{st}"] = one(
            r0 * mult * 2, s0 * mult * 2, pts[st], pts[st],
            data[f"neighbors_{st}"],
        )
    data["influence_sig"] = influence_signature(model_cfg)
    return data
