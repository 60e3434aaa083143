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
    batch = args.batch if args.batch and args.batch > 1 else 1
    buf_img, buf_ts = [], []
    for i, fr in enumerate(ds):
        if args.max_frames and i >= args.max_frames:
            break
        img = fr.load()
        if batch > 1:
            # microbatched dispatch: one fused device program per chunk
            buf_img.append(img)
            buf_ts.append(fr.t)
            if len(buf_img) == batch:
                with timer:
                    sys_.track_monocular_batch(buf_img, buf_ts)
                timer.times[-1] /= batch   # per-frame attribution
                timer.times += [timer.times[-1]] * (batch - 1)
                # --viz in batch mode: overlay the chunk's last frame (the
                # only one whose debug state survives the batch readback)
                viewer.update(sys_.tracker, buf_img[-1])
                buf_img, buf_ts = [], []
        else:
            with timer:
                state, T = sys_.track_monocular(img, fr.t)
            viewer.update(sys_.tracker, img)
    if buf_img:
        for im, t in zip(buf_img, buf_ts):
            with timer:
                sys_.track_monocular(im, t)
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
