"""Format a data dir's audio: mono PCM16 wav/flac at the recipe rate.

The reference's recipe stage 2 (egs2/vctk/sedit/mlm.sh:294 ->
egs2/TEMPLATE/tts1/scripts/audio/format_wav_scp.sh) converts and resamples
every source file with sox/flac before feature extraction; this CLI is the
host-side equivalent on scipy polyphase resampling.

    python -m a3t_tpu.bin.format_data --data-dir data/tr_no_dev \
        --out dump/raw/tr_no_dev --fs 24000
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fs", type=int, required=True)
    ap.add_argument("--expected-source-fs", type=int, default=0,
                    help="error if any source file deviates (0 = any)")
    ap.add_argument("--audio-format", default="wav", choices=["wav", "flac"],
                    help="output container (reference format_wav_scp.sh "
                         "defaults to flac storage)")
    args = ap.parse_args(argv)

    from a3t_tpu.data.format_wav import format_data_dir

    report = format_data_dir(
        args.data_dir, args.out, args.fs,
        expected_source_fs=args.expected_source_fs or None,
        audio_format=args.audio_format)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
