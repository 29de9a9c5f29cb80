#!/usr/bin/env python
"""Offline scorer CLI: two submission .gz files -> RayIoU@{1,2,4} / mAVE /
OccScore.  Equivalent of the reference `tools/ray_iou/metric.py` (:83-142),
matching the challenge server's computation."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--out", default=None,
                   help="also write the score dict to this json file")
    args = p.parse_args()

    from occnet_tpu.evaluation.submission import score_submissions
    scores = score_submissions(args.pred, args.gt)
    print(json.dumps(scores, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(scores, f)


if __name__ == "__main__":
    main()
