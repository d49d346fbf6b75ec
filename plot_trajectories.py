"""Overlay saved trajectories (reference: plot_trajectories.py:1-15)."""

import argparse

from lidar_slam_tpu.utils import io
from lidar_slam_tpu.utils.plotting import plot_trajectories

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Plot robot trajectories")
    parser.add_argument("--poses", type=str, nargs="+", required=True,
                        help="The paths to the pose .npy files")
    parser.add_argument("--labels", type=str, nargs="+", default=None,
                        help="Labels, one per pose file")
    parser.add_argument("--out", type=str, default="images/trajectory.png",
                        help="Output image path")
    parser.add_argument("--title", type=str, default=None)
    args = parser.parse_args()

    poses = [io.load_numpy(p) for p in args.poses]
    plot_trajectories(poses, args.out, labels=args.labels, title=args.title)
    print(f"saved {args.out}")
