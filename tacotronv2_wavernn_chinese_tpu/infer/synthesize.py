"""Synthesis CLI: text -> wav (+ mel npy, alignment/mel PNGs).

Replaces the reference tacotron_synthesize.py CLI (:129-200) and the
eval/live modes of tacotron/synthesize.py:14-134.

Usage:
    python -m tacotronv2_wavernn_chinese_tpu.infer.synthesize \
        --text '你好世界。' --ckpt-dir logs-tacotron/taco_pretrained \
        [--wavernn-ckpt-dir logs-wavernn/checkpoints] [--live]
"""

from __future__ import annotations

import argparse
import time

from ..config import default_config
from ..utils import logging as infolog
from .synthesizer import Synthesizer


def main() -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--params-npz", default=None,
                    help="flat .npz Tacotron weights (e.g. from tools/import_tf_checkpoint)")
    ap.add_argument("--wavernn-ckpt-dir", default=None,
                    help="if set, vocode with WaveRNN instead of Griffin-Lim")
    ap.add_argument("--wavernn-params-npz", default=None,
                    help="flat .npz WaveRNN weights (tools/import_torch_wavernn)")
    ap.add_argument("--out-dir", default="tacotron_inference_output")
    ap.add_argument("--live", action="store_true", help="stdin REPL")
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    if not args.ckpt_dir and not args.params_npz:
        ap.error("one of --ckpt-dir / --params-npz is required")
    if args.params_npz or args.wavernn_params_npz:
        import jax

        from ..utils.checkpoints import CheckpointManager, load_params_npz

        if args.params_npz:
            params = load_params_npz(args.params_npz)
        else:
            from ..train import tacotron_task as TT

            st = CheckpointManager(args.ckpt_dir).restore(
                TT.init_state(jax.random.PRNGKey(0), cfg)
            )
            if st is None:
                raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
            params = st.params
        voc = None
        if args.wavernn_params_npz:
            voc = load_params_npz(args.wavernn_params_npz)
        elif args.wavernn_ckpt_dir:
            from ..train import wavernn_task as WT

            vs = CheckpointManager(args.wavernn_ckpt_dir).restore(
                WT.init_state(jax.random.PRNGKey(0), cfg)
            )
            if vs is None:  # never silently fall back to Griffin-Lim
                raise FileNotFoundError(f"no checkpoint under {args.wavernn_ckpt_dir}")
            voc = vs.params
        synth = Synthesizer(cfg, params, vocoder_params=voc)
    else:
        synth = Synthesizer.from_checkpoints(cfg, args.ckpt_dir, args.wavernn_ckpt_dir)

    if args.live:
        synth.run_live()
        return
    if not args.text:
        ap.error("--text is required unless --live")
    t0 = time.time()
    r = synth.synthesize(args.text, out_dir=args.out_dir)
    dur = r["wav"].shape[0] / cfg.audio.sample_rate
    infolog.log(
        f"synthesized {dur:.2f}s audio in {time.time() - t0:.2f}s "
        f"-> {r['paths']['wav']} (pyin: {r['pyin']})"
    )


if __name__ == "__main__":
    main()
