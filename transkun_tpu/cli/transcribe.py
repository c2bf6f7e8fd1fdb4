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
    parser.add_argument(
        "audioPath",
        help="input audio file, or a directory (every contained audio file "
        "is transcribed, mirroring the tree into outPath)",
    )
    parser.add_argument("outPath", help="output MIDI file or directory")
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
    parser.add_argument(
        "--device", default=None, choices=["cpu", "tpu"],
        help="'cpu' forces host execution (reference flag parity); default: "
        "the available accelerator",
    )
    parser.add_argument(
        "--allDevices", action="store_true",
        help="directory mode: round-robin pieces over every local "
        "accelerator (multi-chip serving)",
    )
    args = parser.parse_args(argv)

    if args.device == "cpu":
        # must be pinned before any jax backend init
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

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
        # the shipped-checkpoint architecture (packaged conf asset, same
        # role as the reference's pkg_resources default, transcribe.py:22-25)
        from ..models.config import load_default_conf

        _, conf = load_default_conf()

    from ..models.transkun import TransKun

    model = TransKun(conf, compute_dtype=jnp.bfloat16 if args.bf16 else None)
    if args.weight is not None:
        params = load_params(args.weight, conf)
    else:
        print("warning: no --weight given, using random initialization")
        params = model.init(jax.random.PRNGKey(0))

    def transcribe_one(audio_path: str, out_path: str):
        fs, audio = read_audio(audio_path)
        if fs != model.fs:
            audio = resample(audio, fs, model.fs)
        notes = model.transcribe(
            params,
            audio,
            step_in_second=args.segmentHopSize,
            segment_size_in_second=args.segmentSize,
            discard_second_half=False,
        )
        write_midi(notes, out_path)
        print(f"wrote {len(notes)} events to {out_path}")

    if os.path.isdir(args.audioPath):
        import pathlib
        import time

        root = pathlib.Path(args.audioPath)
        files = sorted(
            p for ext in ("*.wav", "*.mp3", "*.flac")
            for p in root.rglob(ext)
        )
        print(f"{len(files)} audio files")
        t0 = time.time()
        durs = []

        def read_all():
            # lazy reader: decode/resample piece i+1 on the host while piece
            # i's groups run on the device (transcribe_many pipelines them)
            for p in files:
                fs, audio = read_audio(str(p))
                if fs != model.fs:
                    audio = resample(audio, fs, model.fs)
                durs.append(audio.shape[0] / model.fs)
                yield audio

        results = model.transcribe_many(
            params,
            read_all(),
            step_in_second=args.segmentHopSize,
            segment_size_in_second=args.segmentSize,
            devices=jax.devices() if args.allDevices else None,
        )
        for p, notes in zip(files, results):
            out = pathlib.Path(args.outPath) / p.relative_to(root).with_suffix(".midi")
            out.parent.mkdir(parents=True, exist_ok=True)
            write_midi(notes, str(out))
            print(f"wrote {len(notes)} events to {out}")
        dt = time.time() - t0
        total_audio = sum(durs)
        print(f"RTF: {total_audio / max(dt, 1e-9):.1f}x ({total_audio:.0f}s audio in {dt:.0f}s)")
    else:
        transcribe_one(args.audioPath, args.outPath)


if __name__ == "__main__":
    main()
