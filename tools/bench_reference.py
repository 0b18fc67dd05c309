#!/usr/bin/env python
"""Measured CPU anchor for BASELINE.md's throughput denominators.

Runs the ACTUAL torch reference ELKUNet (segmentation/core/models/
semantic_kitti/linkunet.py, cr 1.0 — the bench.py model) on its CPU
backend over the same synthetic 80k-point SemanticKITTI-shaped scans
bench.py uses, and our JAX stack on the SAME CPU over the same scans.
The pair gives a like-for-like CPU:CPU throughput ratio and a measured
foundation under the estimated 10-scans/s reference-GPU denominator
(bench.py REFERENCE_SCANS_PER_SEC), which was previously a pure guess
(VERDICT round 3, weak #6).

Usage:
  python tools/bench_reference.py [--tsu /tmp/tsu] [--scans 3] \
      [--skip-jax|--skip-torch]

Requires the out-of-tree torchsparse-u CPU build (tests/goldens/README.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_scans(n_scans, num_points=80000):
    """The bench.py input distribution (SyntheticSemanticKITTI train
    split: 80k-voxel cap), returned as unpadded (coords int32 (N, 4)
    xyz+batch, feats f32 (N, 4)) pairs."""
    from link_tpu.data.semantic_kitti import SyntheticSemanticKITTI
    ds = SyntheticSemanticKITTI(length=n_scans, num_points=num_points,
                                n_raw_points=120000, split="train")
    scans = []
    for i in range(n_scans):
        s = ds[i]
        coords = np.asarray(s["coords"])
        feats = np.asarray(s["feats"])
        batch = np.zeros((len(coords), 1), np.int32)
        scans.append((np.concatenate([coords, batch], 1).astype(np.int32),
                      feats.astype(np.float32)))
    return scans


def bench_torch(scans, tsu, reference, threads):
    sys.path.insert(0, tsu)
    sys.path.insert(0, reference)
    import torch
    torch.set_num_threads(threads)
    from torchsparse import SparseTensor as TorchSparseTensor
    from core.models.semantic_kitti.linkunet import ELKUNet as TorchELKUNet

    torch.manual_seed(0)
    model = TorchELKUNet(num_classes=20, cr=1.0, groups=1, baseop="cos_x",
                         r=2, s=3)
    model.eval()

    def fresh(i):
        # a NEW tensor per forward: torchsparse caches kmaps/cmaps on the
        # tensor, and re-running a cached tensor trips a reference bug
        # (conv.py:127 reuses the input coords on a kmap hit with
        # stride>1). Fresh tensors also make each timed call include plan
        # building, like our bench.
        c, f = scans[i]
        return TorchSparseTensor(torch.from_numpy(f), torch.from_numpy(c))

    with torch.no_grad():
        model(fresh(0))                                 # warmup
        times = []
        for i in range(len(scans)):
            t0 = time.perf_counter()
            model(fresh(i))
            times.append(time.perf_counter() - t0)
    return len(times) / sum(times), times


def bench_jax(scans):
    # Force the CPU backend THROUGH THE CONFIG API: this environment's
    # sitecustomize imports jax and pins the remote-TPU 'axon' platform
    # before any env var we set is consulted (JAX_PLATFORMS=cpu is
    # silently ignored — measured: jax.devices() still returns the TPU,
    # whose relay memoizes calls and doesn't reliably block => bogus
    # 0.00 s/scan timings). The config update works as long as no
    # computation has run yet (same pattern as tests/conftest.py).
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    import jax.numpy as jnp
    from link_tpu.data.collate import collate_scans
    from link_tpu.models.linkunet import ELKUNet, DEFAULT_CAPACITIES
    from link_tpu.sparse.tensor import make_sparse_tensor

    caps = DEFAULT_CAPACITIES
    model = ELKUNet(num_classes=20, cr=1.0, capacities=caps,
                    dtype="float32")
    batches = [collate_scans([{"coords": c[:, :3], "feats": f,
                               "labels": np.zeros(len(c), np.int32)}],
                             caps[0]) for c, f in scans]

    @jax.jit
    def fwd(params, feats, coords, nnz):
        st = make_sparse_tensor(feats, coords, nnz=nnz, base_sorted=True)
        return model.apply(params, st, False)

    b0 = batches[0]
    st0 = make_sparse_tensor(jnp.asarray(b0["feats"]),
                             jnp.asarray(b0["coords"]),
                             nnz=jnp.int32(b0["nnz"]), base_sorted=True)
    params = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), st0, False)
    out = fwd(params, jnp.asarray(b0["feats"]), jnp.asarray(b0["coords"]),
              jnp.int32(b0["nnz"]))
    jax.block_until_ready(out)                          # warmup + compile
    times = []
    for b in batches:
        t0 = time.perf_counter()
        out = fwd(params, jnp.asarray(b["feats"]), jnp.asarray(b["coords"]),
                  jnp.int32(b["nnz"]))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return len(times) / sum(times), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsu", default="/tmp/tsu")
    ap.add_argument("--reference", default="/root/reference/segmentation")
    ap.add_argument("--scans", type=int, default=3)
    ap.add_argument("--points", type=int, default=80000)
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    ap.add_argument("--skip-jax", action="store_true")
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    scans = make_scans(args.scans, args.points)
    print(f"# scans: {[len(c) for c, _ in scans]} voxels")
    res = {}
    if not args.skip_torch:
        tput, times = bench_torch(scans, args.tsu, args.reference,
                                  args.threads)
        res["reference_torch_cpu_scans_per_sec"] = round(tput, 4)
        print(f"# torch reference CPU: {[f'{t:.2f}' for t in times]} s/scan")
    if not args.skip_jax:
        tput, times = bench_jax(scans)
        res["link_tpu_jax_cpu_scans_per_sec"] = round(tput, 4)
        res["jax_times"] = [round(t, 3) for t in times]
        print(f"# link_tpu JAX CPU: {[f'{t:.2f}' for t in times]} s/scan")
    res["threads"] = args.threads
    print(json.dumps(res))


if __name__ == "__main__":
    main()
