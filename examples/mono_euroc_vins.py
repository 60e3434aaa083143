"""Mono-inertial EuRoC runner (reference Examples/Monocular/
mono_euroc_vins.cc — image + IMU csv interleaving)."""
from common import base_parser, load_system, TrackTimer, maybe_eval_ate


def main():
    p = base_parser("Mono-inertial EuRoC")
    p.add_argument("--save-navstate", default=None, metavar="FILE",
                   help="also save the per-keyframe NavState trajectory "
                        "(reference SaveKeyFrameTrajectoryNavState)")
    args = p.parse_args()
    from ygz_tpu.io.datasets import EurocDataset
    from ygz_tpu.system import Sensor
    from ygz_tpu.geometry.camera import Camera

    ds = EurocDataset(args.dataset, with_imu=True)
    default_cam = Camera.make(458.654, 457.296, 367.215, 248.375, 752, 480,
                              dist=[-0.28340811, 0.07395907, 0.00019359,
                                    1.76187114e-05])
    sys_ = load_system(args, Sensor.MONO_VI, default_cam)
    timer = TrackTimer()
    for i, fr in enumerate(ds):
        if args.max_frames and i >= args.max_frames:
            break
        imu = [(s.t, s.gyro, s.acc) for s in fr.imu]
        with timer:
            state, T = sys_.track_mono_vi(fr.load(), imu, fr.t)
    timer.report()
    if args.timings:
        print(sys_.tracker.timer.report())
        print("counters:", {k: v for k, v in sys_.tracker.stats().items()
                            if k != "stage_ms"})
    print("VINS initialized:", sys_.tracker.vio_ready,
          "scale:", sys_.tracker.vins_scale)
    sys_.save_trajectory_tum(args.out)
    print(f"trajectory -> {args.out}")
    if args.save_navstate and sys_.tracker.vio_ready:
        sys_.save_keyframe_trajectory_navstate(args.save_navstate)
        print(f"NavState keyframe trajectory -> {args.save_navstate}")
    maybe_eval_ate(sys_, ds, args, with_scale=False)


if __name__ == "__main__":
    main()
