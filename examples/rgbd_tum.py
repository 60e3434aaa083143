"""RGB-D TUM runner (reference Examples/RGB-D/rgbd_tum.cc)."""
from common import (base_parser, load_system, TrackTimer, maybe_eval_ate,
                    make_viewer)


def main():
    p = base_parser("RGB-D TUM")
    p.add_argument("--depth-factor", type=float, default=5000.0)
    args = p.parse_args()
    from ygz_tpu.io.datasets import TumRgbdDataset
    from ygz_tpu.system import Sensor
    from ygz_tpu.geometry.camera import Camera

    ds = TumRgbdDataset(args.dataset)
    default_cam = Camera.make(517.306408, 516.469215, 318.643040, 255.313989,
                              640, 480, dist=[0.262383, -0.953104, -0.005358,
                                              0.002628, 1.163314])
    sys_ = load_system(args, Sensor.RGBD, default_cam)
    timer = TrackTimer()
    viewer = make_viewer(args)
    for i, fr in enumerate(ds):
        if args.max_frames and i >= args.max_frames:
            break
        img = fr.load()
        with timer:
            state, T = sys_.track_rgbd(img,
                                       fr.load_depth(args.depth_factor), fr.t)
        viewer.update(sys_.tracker, img)
    timer.report()
    if args.timings:
        print(sys_.tracker.timer.report())
        print("counters:", {k: v for k, v in sys_.tracker.stats().items()
                            if k != "stage_ms"})
    viewer.finish(sys_.tracker)
    sys_.save_trajectory_tum(args.out)
    print(f"trajectory -> {args.out}")
    maybe_eval_ate(sys_, ds, args, with_scale=False)


if __name__ == "__main__":
    main()
