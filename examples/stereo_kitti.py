"""Stereo KITTI odometry runner (reference Examples/Stereo/stereo_kitti.cc).

KITTI grayscale pairs are rectified; default intrinsics/baseline are the
sequence-00 calibration (fx 718.856, baseline 0.5372 m -> bf 386.1448).
"""
from common import (base_parser, load_system, TrackTimer, maybe_eval_ate,
                    make_viewer)


def main():
    p = base_parser("Stereo KITTI")
    p.add_argument("--seq", default="00")
    p.add_argument("--bf", type=float, default=386.1448)
    args = p.parse_args()
    from ygz_tpu.io.datasets import KittiOdometryDataset
    from ygz_tpu.system import Sensor
    from ygz_tpu.geometry.camera import Camera

    left = KittiOdometryDataset(args.dataset, seq=args.seq, cam="image_0")
    right = KittiOdometryDataset(args.dataset, seq=args.seq, cam="image_1")
    default_cam = Camera.make(718.856, 718.856, 607.1928, 185.2157,
                              1241, 376, bf=args.bf)
    sys_ = load_system(args, Sensor.STEREO, default_cam)
    timer = TrackTimer()
    viewer = make_viewer(args)
    n = min(len(left), len(right))
    for i in range(n):
        if args.max_frames and i >= args.max_frames:
            break
        img = left.frames[i].load()
        with timer:
            state, T = sys_.track_stereo(img, right.frames[i].load(),
                                         left.frames[i].t)
        viewer.update(sys_.tracker, img)
    timer.report()
    if args.timings:
        print(sys_.tracker.timer.report())
        print("counters:", {k: v for k, v in sys_.tracker.stats().items()
                            if k != "stage_ms"})
    viewer.finish(sys_.tracker)
    sys_.save_trajectory_kitti(args.out)
    print(f"trajectory -> {args.out}")
    maybe_eval_ate(sys_, left, args, with_scale=False)


if __name__ == "__main__":
    main()
