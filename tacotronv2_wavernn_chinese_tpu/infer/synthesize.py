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
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--wavernn-ckpt-dir", default=None,
                    help="if set, vocode with WaveRNN instead of Griffin-Lim")
    ap.add_argument("--out-dir", default="tacotron_inference_output")
    ap.add_argument("--live", action="store_true", help="stdin REPL")
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
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
