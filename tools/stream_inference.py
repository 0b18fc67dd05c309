"""Streaming single-frame inference.

Equivalent of the reference's online inference nodes
(detection/tools/single_infernece_ros.py, multi_sweep_inference_ros.py)
without the ROS hard-dependency: a warm jitted predictor consumes point
clouds one at a time and emits per-frame detection JSON lines.

Sources:
  --files a.bin b.npy ...   explicit list;
  --watch-dir DIR           poll DIR for new .bin/.npy files (online
                            mode; ctrl-C to stop);
  --synthetic N             generated frames (plumbing check);
  --ros TOPIC               subscribe to a PointCloud2 topic (requires
                            rospy + ros_numpy, gated like the rest of
                            the optional deps).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_points(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    return np.fromfile(path, np.float32).reshape(-1, 5)


def emit(out, token, det, t_ms):
    rec = {"token": token, "latency_ms": round(t_ms, 2),
           "boxes": det["box3d_lidar"].tolist(),
           "scores": det["scores"].tolist(),
           "labels": det["label_preds"].tolist()}
    out.write(json.dumps(rec) + "\n")
    out.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("--watch-dir", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--ros", default=None, help="PointCloud2 topic")
    ap.add_argument("--out", default=None, help="JSONL sink (default stdout)")
    ap.add_argument("--poll-s", type=float, default=0.2)
    ap.add_argument("--tiny", action="store_true",
                    help="small grid/capacities (plumbing smoke test)")
    args = ap.parse_args()

    from link_tpu.inference import SingleFramePredictor
    kw = {}
    if args.tiny:
        kw = dict(capacity=4096, grid_shape=(48, 48, 40), max_voxels=4000,
                  test_cfg=dict(pc_range=[-12, -12], voxel_size=[0.5, 0.5],
                                post_center_limit_range=[-15, -15, -10,
                                                         15, 15, 10],
                                nms_pre_max_size=200, nms_post_max_size=40,
                                max_per_img=100))
    pred = SingleFramePredictor(config=args.config,
                                checkpoint=args.checkpoint, **kw)
    out = open(args.out, "w") if args.out else sys.stdout

    def run_one(token, pts):
        t0 = time.perf_counter()
        det = pred.predict(pts)
        emit(out, token, det, (time.perf_counter() - t0) * 1000)

    if args.synthetic:
        rng = np.random.default_rng(0)
        for i in range(args.synthetic):
            n = 30000
            r = np.sqrt(rng.uniform(1, 54 ** 2, n))
            th = rng.uniform(0, 2 * np.pi, n)
            pts = np.stack([r * np.cos(th), r * np.sin(th),
                            rng.normal(-1, 0.8, n),
                            rng.uniform(0, 255, n),
                            np.zeros(n)], 1).astype(np.float32)
            run_one(f"synthetic_{i}", pts)
        return

    if args.files:
        for path in args.files:
            run_one(os.path.basename(path), load_points(path))
        return

    if args.watch_dir:
        seen = set()
        print(f"watching {args.watch_dir} ...", file=sys.stderr)
        try:
            while True:
                for path in sorted(glob.glob(
                        os.path.join(args.watch_dir, "*.bin")) + glob.glob(
                        os.path.join(args.watch_dir, "*.npy"))):
                    if path in seen:
                        continue
                    seen.add(path)
                    run_one(os.path.basename(path), load_points(path))
                time.sleep(args.poll_s)
        except KeyboardInterrupt:
            return

    if args.ros:
        try:
            import rospy
            import ros_numpy
            from sensor_msgs.msg import PointCloud2
        except ImportError:
            raise SystemExit("rospy/ros_numpy not available — use "
                             "--files/--watch-dir instead")

        def cb(msg):
            arr = ros_numpy.numpify(msg)
            pts = np.stack([arr["x"], arr["y"], arr["z"],
                            arr.get("intensity", np.zeros(len(arr))),
                            np.zeros(len(arr))], 1).astype(np.float32)
            run_one(str(msg.header.stamp), pts)

        rospy.init_node("link_tpu_inference")
        rospy.Subscriber(args.ros, PointCloud2, cb, queue_size=1,
                         buff_size=2 ** 24)
        rospy.spin()
        return

    raise SystemExit("need one of --files / --watch-dir / --synthetic / --ros")


if __name__ == "__main__":
    main()
