#!/usr/bin/env python
"""Loss-function goldens vs the reference torch implementations.

Runs the reference Lovász-softmax (segmentation/core/lovasz_losses.py,
with the exact (1, C, N, 1) shaping the trainer uses, trainers.py:69-71)
and the reference FastFocalLoss / RegLoss
(detection/det3d/models/losses/centernet_loss.py) on random inputs and
saves inputs + reference values to tests/goldens/losses.npz.
tests/test_golden_losses.py then asserts our jittable forms reproduce
them — pinning the exact training objectives behind the 67.7-mIoU /
69.5-NDS targets.
"""

import argparse
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_as(dotted: str, path: str):
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    parent, _, leaf = dotted.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], leaf, mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    args = ap.parse_args()
    import torch

    rng = np.random.default_rng(21)
    arrays = {}

    # --- Lovász-softmax (seg) --------------------------------------------
    LL = _load_as("ref_lovasz", os.path.join(
        args.reference, "segmentation/core/lovasz_losses.py"))
    n, c = 500, 20
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int64)
    labels[rng.random(n) < 0.15] = 0                    # ignore class
    out_r = torch.from_numpy(logits).transpose(0, 1)[None, :, :, None]
    tgt_r = torch.from_numpy(labels)[None, :, None]
    lov = LL.lovasz_softmax(torch.nn.functional.softmax(out_r, dim=1),
                            tgt_r, ignore=0)
    arrays.update(lovasz_logits=logits, lovasz_labels=labels,
                  lovasz_value=np.float32(lov.item()))

    # --- FastFocal / RegLoss (det) ---------------------------------------
    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f
    nb = types.ModuleType("numba")
    nb.__spec__ = importlib.machinery.ModuleSpec("numba", None)
    nb.jit = nb.njit = _jit
    sys.modules.setdefault("numba", nb)
    for name in ("det3d", "det3d.core", "det3d.core.utils",
                 "det3d.models", "det3d.models.losses"):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                    is_package=True)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    det = os.path.join(args.reference, "detection")
    _load_as("det3d.core.utils.circle_nms_jit",
             os.path.join(det, "det3d/core/utils/circle_nms_jit.py"))
    _load_as("det3d.core.utils.center_utils",
             os.path.join(det, "det3d/core/utils/center_utils.py"))
    CL = _load_as("det3d.models.losses.centernet_loss",
                  os.path.join(det, "det3d/models/losses/centernet_loss.py"))

    b, ch, h, w, m_ = 1, 3, 24, 24, 20
    d = 10
    ind = rng.choice(h * w, m_, replace=False).astype(np.int64)[None]
    mask = np.zeros((b, m_), np.float32)
    mask[0, :12] = 1
    cat = rng.integers(0, ch, (b, m_)).astype(np.int64)
    # sigmoid-clamped predictions (the trainer applies _sigmoid first)
    hm_out = np.clip(1 / (1 + np.exp(-rng.standard_normal((b, ch, h, w)))),
                     1e-4, 1 - 1e-4).astype(np.float32)
    target = (rng.random((b, ch, h, w)) * 0.9).astype(np.float32)
    for j in range(m_):                                 # exact peaks
        if mask[0, j]:
            target[0, cat[0, j], ind[0, j] // w, ind[0, j] % w] = 1.0
    ff = CL.FastFocalLoss()(torch.from_numpy(hm_out),
                            torch.from_numpy(target),
                            torch.from_numpy(ind), torch.from_numpy(mask),
                            torch.from_numpy(cat))
    reg_out = rng.standard_normal((b, d, h, w)).astype(np.float32)
    reg_tgt = rng.standard_normal((b, m_, d)).astype(np.float32)
    rl = CL.RegLoss()(torch.from_numpy(reg_out), torch.from_numpy(mask),
                      torch.from_numpy(ind), torch.from_numpy(reg_tgt))
    arrays.update(ff_out=hm_out, ff_target=target, ff_ind=ind, ff_mask=mask,
                  ff_cat=cat, ff_value=np.float32(ff.item()),
                  reg_out=reg_out, reg_target=reg_tgt,
                  reg_value=rl.detach().numpy().astype(np.float32))

    # --- OneCycle schedule curve (det) ------------------------------------
    FS = _load_as("ref_fastai_sched", os.path.join(
        det, "det3d/solver/learning_schedules_fastai.py"))
    opt = types.SimpleNamespace(lr=0.0, mom=0.0)
    total, lr_max = 937, 1e-3
    sched = FS.OneCycle(opt, total, lr_max, [0.95, 0.85], 10.0, 0.4)
    steps = np.unique(np.concatenate(
        [np.arange(0, total, 37), [total - 1]])).astype(np.int64)
    lrs, moms = [], []
    for st in steps:
        sched.step(int(st))
        lrs.append(opt.lr)
        moms.append(opt.mom)
    arrays.update(oc_steps=steps, oc_total=np.int64(total),
                  oc_lr_max=np.float64(lr_max),
                  oc_lr=np.asarray(lrs, np.float64),
                  oc_mom=np.asarray(moms, np.float64))

    # --- gaussian_radius + draw_umich_gaussian (det targets) --------------
    CU = sys.modules["det3d.core.utils.center_utils"]
    hw = rng.uniform(0.5, 40, (64, 2)).astype(np.float64)
    radii = np.asarray([CU.gaussian_radius((h_, w_), min_overlap=0.1)
                        for h_, w_ in hw], np.float64)
    heat = np.zeros((40, 40), np.float32)
    centers = rng.integers(2, 38, (6, 2)).astype(np.int64)
    for ci, (cx, cy) in enumerate(centers):
        CU.draw_umich_gaussian(heat, (int(cx), int(cy)), 2 + ci)
    arrays.update(gr_hw=hw, gr_radii=radii, dug_centers=centers,
                  dug_heat=heat)

    # --- box geometry (eval/NMS substrate) ---------------------------------
    sys.modules["det3d.core"].bbox = sys.modules.setdefault(
        "det3d.core.bbox", types.ModuleType("det3d.core.bbox"))
    sys.modules["det3d.core.bbox"].__path__ = []
    sys.modules["det3d.core.bbox"].__spec__ = importlib.machinery.ModuleSpec(
        "det3d.core.bbox", None, is_package=True)
    _load_as("det3d.core.bbox.geometry",
             os.path.join(det, "det3d/core/bbox/geometry.py"))
    BO = _load_as("det3d.core.bbox.box_np_ops",
                  os.path.join(det, "det3d/core/bbox/box_np_ops.py"))
    nb_ = 24
    centers = rng.uniform(-30, 30, (nb_, 2))
    dims = rng.uniform(0.5, 6, (nb_, 2))
    angles = rng.uniform(-2 * np.pi, 2 * np.pi, nb_)
    corners = BO.center_to_corner_box2d(centers, dims, angles)
    pts = np.concatenate(
        [rng.uniform(-32, 32, (800, 2)), rng.uniform(-2.5, 2.5, (800, 1))],
        axis=1).astype(np.float64)
    boxes7 = np.concatenate(
        [centers, rng.uniform(-1, 1, (nb_, 1)), dims,
         rng.uniform(1, 3, (nb_, 1)), angles[:, None]], axis=1)
    inside = BO.points_in_rbbox(pts, boxes7)
    arrays.update(box_centers=centers, box_dims=dims, box_angles=angles,
                  box_corners=corners, pir_points=pts, pir_boxes=boxes7,
                  pir_inside=inside)

    # --- fastai OptimWrapper true-wd Adam step (det optimizer) -------------
    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):      # py3.10+ removal
        collections.Iterable = collections.abc.Iterable
    from functools import partial
    FO = _load_as("ref_fastai_optim", os.path.join(
        det, "det3d/solver/fastai_optim.py"))
    torch.manual_seed(13)
    mdl = torch.nn.Sequential(torch.nn.Linear(4, 3),
                              torch.nn.BatchNorm1d(3))
    wrap = FO.OptimWrapper.create(
        partial(torch.optim.Adam, betas=(0.9, 0.99), amsgrad=False),
        3e-3, [mdl], wd=0.01, true_wd=True, bn_wd=True)
    p0 = {k: v.detach().clone().numpy() for k, v in mdl.named_parameters()}
    lrs_o, moms_o, grads = [(7e-4, 0.93), (6e-4, 0.91)], [], {}
    for si, (lr_, mom_) in enumerate(lrs_o):
        wrap.lr, wrap.mom = lr_, mom_
        for k, v in mdl.named_parameters():
            gk = rng.standard_normal(v.shape).astype(np.float32) * 0.1
            grads[f"{k}@{si}"] = gk
            v.grad = torch.from_numpy(gk)
        wrap.step()
        wrap.zero_grad()
    p2 = {k: v.detach().clone().numpy() for k, v in mdl.named_parameters()}
    arrays.update(
        opt_lrs=np.asarray([x[0] for x in lrs_o], np.float64),
        opt_moms=np.asarray([x[1] for x in lrs_o], np.float64),
        **{"optp0_" + k.replace(".", "__"): v for k, v in p0.items()},
        **{"optp2_" + k.replace(".", "__"): v for k, v in p2.items()},
        **{"optg_" + k.replace(".", "__").replace("@", "_s"): v
           for k, v in grads.items()})

    # --- seg cosine-warmup schedule (schedulers.py:7-20) -------------------
    tp = types.ModuleType("torchpack")
    tpd = types.ModuleType("torchpack.distributed")
    for mname, mod in (("torchpack", tp), ("torchpack.distributed", tpd)):
        mod.__spec__ = importlib.machinery.ModuleSpec(mname, None)
        sys.modules.setdefault(mname, mod)
    tp.distributed = tpd
    SS = _load_as("ref_seg_sched", os.path.join(
        args.reference, "segmentation/core/schedulers.py"))
    for world in (1, 4):
        tpd.size = lambda w=world: w
        mult = np.asarray(
            [SS.cosine_schedule_with_warmup(k, 25, 2, 19130)
             for k in range(0, 240000, 997)], np.float64)
        arrays[f"cw_mult_w{world}"] = mult
    arrays["cw_steps"] = np.arange(0, 240000, 997).astype(np.int64)

    # --- torchie LrUpdater family (hooks/lr_updater.py:10-175) -------------
    # run the ACTUAL reference hooks against a fake trainer and record the
    # per-iteration lr the optimizer would see. NOTE ExpLrUpdaterHook is
    # dead code in the reference: its get_lr references an undefined
    # `trainer` (the param is `runner`, lr_updater.py:127) and raises
    # NameError on every call — so `exp` has no runnable golden; our port
    # implements the obvious intent (base_lr * gamma**progress).
    # StepLrUpdaterHook has the same bug ONLY in its by_epoch=False arm
    # (lr_updater.py:109), so `step` goldens are by_epoch=True.
    def pkgmod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                    is_package=True)
        m.__path__ = []
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    for nm in ("det3d", "det3d.solver", "det3d.torchie",
               "det3d.torchie.trainer", "det3d.torchie.trainer.hooks"):
        pkgmod(nm)
    _load_as("det3d.solver.learning_schedules_fastai", os.path.join(
        args.reference,
        "detection/det3d/solver/learning_schedules_fastai.py"))
    _load_as("det3d.torchie.trainer.hooks.hook", os.path.join(
        args.reference, "detection/det3d/torchie/trainer/hooks/hook.py"))
    LU = _load_as("det3d.torchie.trainer.hooks.lr_updater", os.path.join(
        args.reference,
        "detection/det3d/torchie/trainer/hooks/lr_updater.py"))

    def run_hook(hook, base_lr, epochs, spe):
        trainer = types.SimpleNamespace(
            optimizer=types.SimpleNamespace(param_groups=[{"lr": base_lr}]),
            epoch=0, iter=0, max_epochs=epochs, max_iters=epochs * spe)
        hook.before_run(trainer)
        lrs = []
        it = 0
        for ep in range(epochs):
            trainer.epoch = ep
            hook.before_train_epoch(trainer)
            for _ in range(spe):
                trainer.iter = it
                hook.before_train_iter(trainer)
                lrs.append(trainer.optimizer.param_groups[0]["lr"])
                it += 1
        return np.asarray(lrs, np.float64)

    E, SPE = 12, 7
    lr_cases = {
        "lu_fixed_warmlin": LU.FixedLrUpdaterHook(
            warmup="linear", warmup_iters=9, warmup_ratio=0.2),
        "lu_step_milestones": LU.StepLrUpdaterHook(step=[3, 7, 10],
                                                   gamma=0.3),
        "lu_step_int": LU.StepLrUpdaterHook(step=4),
        "lu_poly_iter_warmexp": LU.PolyLrUpdaterHook(
            power=1.5, min_lr=1e-4, by_epoch=False, warmup="exp",
            warmup_iters=11, warmup_ratio=0.1),
        "lu_inv_iter": LU.InvLrUpdaterHook(gamma=0.05, power=0.75,
                                           by_epoch=False),
        "lu_cosine_warmconst": LU.CosineLrUpdaterHook(
            target_lr=1e-4, warmup="constant", warmup_iters=5,
            warmup_ratio=0.3),
    }
    for key, hook in lr_cases.items():
        arrays[key] = run_hook(hook, 0.02, E, SPE)
    arrays["lu_epochs"] = np.int64(E)
    arrays["lu_spe"] = np.int64(SPE)

    # --- sparse_quantize + kernel offsets (torchsparse-u) ------------------
    tsu = "/tmp/tsu"
    if os.path.isdir(tsu):
        sys.path.insert(0, tsu)
        from torchsparse.nn.utils import get_kernel_offsets
        from torchsparse.utils.quantize import sparse_quantize

        pts = rng.uniform(-40, 40, (5000, 3)).astype(np.float64)
        qc, qi, qinv = sparse_quantize(pts.copy(), 0.05, return_index=True,
                                       return_inverse=True)
        arrays.update(sq_points=pts, sq_coords=qc.astype(np.int32),
                      sq_index=qi.astype(np.int64),
                      sq_inverse=qinv.astype(np.int64))
        offs = {}
        for ks, st_, dil in ((3, 1, 1), (2, 2, 1), (3, 2, 1), ((1, 1, 3), 1, 1),
                             (5, 1, 1), (2, 1, 1), (7, 1, 1)):
            o = get_kernel_offsets(ks, stride=st_, dilation=dil).numpy()
            key = f"ko_{ks}_{st_}_{dil}".replace("(", "").replace(")", "") \
                .replace(", ", "x").replace(" ", "")
            offs[key] = o.astype(np.int32)
        arrays.update(offs)
    else:
        print("NOTE: /tmp/tsu missing — quantize/kernel-offset goldens "
              "not regenerated (see tests/goldens/README.md)")

    np.savez_compressed(os.path.join(args.out, "losses.npz"), **arrays)
    print(f"losses golden: lovasz={lov.item():.6f} ff={ff.item():.6f} "
          f"reg={rl.detach().numpy()} oc_lr[-1]={lrs[-1]:.3e} "
          f"inside={int(inside.sum())}")


if __name__ == "__main__":
    main()
