#!/usr/bin/env python
"""Offline ray projection CLI.

Equivalent of the reference `tools/ray_iou/ray_casting.py` (:204-309): given a
directory of per-token prediction `.npz` files (semantics [200,200,16] +
flow [200,200,16,2]) and the val infos pkl, renders prediction AND ground
truth through the on-device ray caster and writes both submission `.gz`
files; score them with tools/metric.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True,
                   help="dir of <token>.npz with 'semantics' and 'flow'")
    p.add_argument("--infos", required=True, help="nuscenes infos pkl (val)")
    p.add_argument("--data-root", default="",
                   help="root for relative occ_path GT files")
    p.add_argument("--pred-out", default="my_pred_pcd.gz")
    p.add_argument("--gt-out", default="gt_pcd.gz")
    p.add_argument("--dataset-type", default="openocc_v2",
                   choices=["openocc_v2", "lightwheelocc"])
    p.add_argument("--max-samples", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from occnet_tpu.data.nuscenes import load_infos
    from occnet_tpu.data.pipeline import load_occ_gt
    from occnet_tpu.evaluation.ego_pose import extract_ego_origins
    from occnet_tpu.evaluation.submission import write_submission

    infos, _ = load_infos(args.infos)
    if args.max_samples:
        infos = infos[: args.max_samples]
    origins = dict(extract_ego_origins(infos, args.dataset_type))

    def pred_samples():
        for info in infos:
            token = info["token"]
            f = np.load(os.path.join(args.pred_dir, f"{token}.npz"))
            yield token, f["semantics"].astype(np.int32), \
                f["flow"].astype(np.float32), origins[token]

    def gt_samples():
        for info in infos:
            token = info["token"]
            occ_path = info.get("occ_path")
            if occ_path and args.data_root and not os.path.isabs(occ_path):
                occ_path = os.path.join(args.data_root, occ_path)
            sem, flow = load_occ_gt(occ_path)
            yield token, sem.astype(np.int32), flow, origins[token]

    print(f"rendering {len(infos)} predictions -> {args.pred_out}")
    write_submission(args.pred_out, pred_samples())
    print(f"rendering {len(infos)} ground truths -> {args.gt_out}")
    write_submission(args.gt_out, gt_samples())
    print("done; score with: python tools/metric.py "
          f"--pred {args.pred_out} --gt {args.gt_out}")


if __name__ == "__main__":
    main()
