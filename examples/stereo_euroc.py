"""Stereo EuRoC runner (reference Examples/Stereo/stereo_euroc.cc).

NOTE: expects rectified pairs; for raw EuRoC data run a rectification step
first or provide rectified cam0/cam1 directories.
"""
from common import base_parser, load_system, TrackTimer, maybe_eval_ate


def main():
    p = base_parser("Stereo EuRoC")
    p.add_argument("--bf", type=float, default=47.90639384423901,
                   help="baseline * fx (EuRoC default)")
    args = p.parse_args()
    from ygz_tpu.io.datasets import EurocDataset
    from ygz_tpu.system import Sensor
    from ygz_tpu.geometry.camera import Camera

    left = EurocDataset(args.dataset, cam="cam0")
    right = EurocDataset(args.dataset, cam="cam1")
    default_cam = Camera.make(435.2046959714599, 435.2046959714599,
                              367.4517211914062, 252.2008514404297,
                              752, 480, bf=args.bf)
    sys_ = load_system(args, Sensor.STEREO, default_cam)
    timer = TrackTimer()
    n = min(len(left), len(right))
    for i in range(n):
        if args.max_frames and i >= args.max_frames:
            break
        with timer:
            state, T = sys_.track_stereo(left.frames[i].load(),
                                         right.frames[i].load(),
                                         left.frames[i].t)
    timer.report()
    if args.timings:
        print(sys_.tracker.timer.report())
        print("counters:", {k: v for k, v in sys_.tracker.stats().items()
                            if k != "stage_ms"})
    sys_.save_trajectory_tum(args.out)
    print(f"trajectory -> {args.out}")
    maybe_eval_ate(sys_, left, args, with_scale=False)


if __name__ == "__main__":
    main()
