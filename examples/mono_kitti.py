"""Monocular KITTI odometry runner (reference Examples/Monocular/
mono_kitti.cc)."""
from common import base_parser, load_system, TrackTimer


def main():
    p = base_parser("Monocular KITTI")
    p.add_argument("--seq", default="00")
    args = p.parse_args()
    from ygz_tpu.io.datasets import KittiOdometryDataset
    from ygz_tpu.system import Sensor
    from ygz_tpu.geometry.camera import Camera

    ds = KittiOdometryDataset(args.dataset, seq=args.seq)
    default_cam = Camera.make(718.856, 718.856, 607.1928, 185.2157, 1241, 376)
    sys_ = load_system(args, Sensor.MONOCULAR, default_cam)
    timer = TrackTimer()
    viewer = make_viewer(args)
    for i, fr in enumerate(ds):
        if args.max_frames and i >= args.max_frames:
            break
        img = fr.load()
        with timer:
            state, T = sys_.track_monocular(img, fr.t)
        viewer.update(sys_.tracker, img)
    timer.report()
    if args.timings:
        print(sys_.tracker.timer.report())
        print("counters:", {k: v for k, v in sys_.tracker.stats().items()
                            if k != "stage_ms"})
    viewer.finish(sys_.tracker)
    sys_.save_trajectory_kitti(args.out)
    print(f"trajectory -> {args.out}")


if __name__ == "__main__":
    main()
