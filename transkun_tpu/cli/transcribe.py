"""Inference CLI: audio file in, MIDI file out.

Mirrors the reference console script (``transkun/transcribe.py``):

    python -m transkun_tpu.cli.transcribe input.wav output.mid \
        --weight ckpt_dir_or_pt --conf model.conf
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Transcribe audio to MIDI")
    parser.add_argument("audioPath", help="path to the input audio file")
    parser.add_argument("outPath", help="path to the output MIDI file")
    parser.add_argument("--weight", default=None, help="checkpoint (orbax dir or torch .pt)")
    parser.add_argument("--conf", default=None, help="model conf JSON")
    parser.add_argument(
        "--segmentHopSize", type=float, required=False,
        help="segment hop for streaming decode (s); default from conf",
    )
    parser.add_argument(
        "--segmentSize", type=float, required=False,
        help="segment size for streaming decode (s); default from conf",
    )
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    args = parser.parse_args(argv)

    from ..utils.jax_setup import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from ..data.audio import read_audio, resample
    from ..data.midi import write_midi
    from ..models.config import ModelConfig, parse_conf_file
    from ..train.checkpoint import load_params

    if args.conf is not None:
        _, conf = parse_conf_file(args.conf)
    else:
        # the shipped-checkpoint architecture (ref pretrained/2.0.conf)
        conf = ModelConfig.from_dict(
            dict(baseSize=64, nHead=8, nLayers=6, contextDropoutProb=0.0)
        )

    from ..models.transkun import TransKun

    model = TransKun(conf, compute_dtype=jnp.bfloat16 if args.bf16 else None)
    if args.weight is not None:
        params = load_params(args.weight, conf)
    else:
        print("warning: no --weight given, using random initialization")
        params = model.init(jax.random.PRNGKey(0))

    fs, audio = read_audio(args.audioPath)
    if fs != model.fs:
        audio = resample(audio, fs, model.fs)

    notes = model.transcribe(
        params,
        audio,
        step_in_second=args.segmentHopSize,
        segment_size_in_second=args.segmentSize,
        discard_second_half=False,
    )
    write_midi(notes, args.outPath)
    print(f"wrote {len(notes)} events to {args.outPath}")


if __name__ == "__main__":
    main()
