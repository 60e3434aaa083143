"""Monocular EuRoC runner (reference Examples/Monocular/mono_euroc.cc)."""
from common import (base_parser, load_system, TrackTimer, maybe_eval_ate,
                    make_viewer)


def main():
    args = base_parser("Monocular EuRoC").parse_args()
    from ygz_tpu.io.datasets import EurocDataset
    from ygz_tpu.system import Sensor
    from ygz_tpu.geometry.camera import Camera

    ds = EurocDataset(args.dataset)
    default_cam = Camera.make(458.654, 457.296, 367.215, 248.375, 752, 480,
                              dist=[-0.28340811, 0.07395907, 0.00019359,
                                    1.76187114e-05])
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
    sys_.save_trajectory_tum(args.out)
    print(f"trajectory -> {args.out}")
    maybe_eval_ate(sys_, ds, args, with_scale=True)


if __name__ == "__main__":
    main()
