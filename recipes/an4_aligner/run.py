"""Aligner accuracy evaluation on real speech (CMU AN4) vs HTK.

Trains the native C++ flat-start monophone aligner (a3t_tpu.align.native)
and an HTK flat-start system (HCompV + HERest + HVite, the reference's
toolchain — tools/HTKTools) on the SAME real recorded utterances, force-
aligns both, and reports phone-boundary agreement.  The reference ships
pretrained English HMMs whose hmmdefs blobs are absent from this mount
(tools/alignment/aligner/english/16000/ has only config+macros), so both
systems flat-start — which is also the fairer comparison.

Data: the mini AN4 corpus bundled in the reference for CI
(egs2/mini_an4/asr1/downloads.tar.gz — real 16 kHz microphone speech with
transcripts and a CMU-style pronouncing dictionary).

    python recipes/an4_aligner/run.py --out exp/an4_aligner

Writes boundary-agreement stats to <out>/ALIGNER_EVAL.json, the trained
aligner artifact to <out>/aligner_an4.bin(.phones) and a summary table to
stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tarfile
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REFERENCE = "/root/reference"
AN4_TAR = f"{REFERENCE}/egs2/mini_an4/asr1/downloads.tar.gz"
HTK = f"{REFERENCE}/tools/HTKTools"


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

def read_sph(path: str) -> tuple[np.ndarray, int]:
    """NIST SPHERE reader (header_size bytes of ASCII, then PCM16)."""
    with open(path, "rb") as f:
        head = f.read(1024).decode("ascii", "ignore")
        assert head.startswith("NIST_1A")
        header_size = int(head.splitlines()[1].strip())
        fs = int(re.search(r"sample_rate -i (\d+)", head).group(1))
        f.seek(header_size)
        pcm = np.frombuffer(f.read(), "<i2")
    return pcm.astype(np.float32) / 32768.0, fs


def load_an4(workdir: str):
    """-> (utts: [(uid, wav, words)], lexicon: {WORD: [phones]})"""
    with tarfile.open(AN4_TAR) as tf:
        tf.extractall(workdir)
    root = os.path.join(workdir, "downloads", "an4")

    lexicon = {}
    with open(os.path.join(root, "etc", "an4.dic")) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            word = re.sub(r"\(\d+\)$", "", parts[0])
            lexicon.setdefault(word, parts[1:])  # first pronunciation wins

    utts = []
    for split, wavdir in (("an4_train", "an4_clstk"),
                          ("an4_test", "an4test_clstk")):
        trans = os.path.join(root, "etc", f"{split}.transcription")
        with open(trans) as f:
            for line in f:
                m = re.match(r"(?:<s> )?(.*?)(?: </s>)? \((\S+)\)",
                             line.strip())
                if not m:
                    continue
                words, uid = m.group(1).split(), m.group(2)
                spk = uid.split("-")[1]
                sph = os.path.join(root, "wav", wavdir, spk, uid + ".sph")
                if not os.path.exists(sph):
                    continue
                wav, fs = read_sph(sph)
                assert fs == 16000
                utts.append((uid, wav, words))

    # the other real fixture in the reference mount: 6.5 s of read speech
    fixture = f"{REFERENCE}/test_utils/ctc_align_test.wav"
    if os.path.exists(fixture):
        import wave as wavemod

        from a3t_tpu.text.native_g2p import letter_to_sound

        with wavemod.open(fixture) as w:
            assert w.getframerate() == 16000
            wav = np.frombuffer(
                w.readframes(w.getnframes()), "<i2").astype(np.float32)
            wav /= 32768.0
        text = ("THE SALE OF THE HOTELS IS PART OF HOLIDAY'S STRATEGY TO "
                "SELL OFF ASSETS AND CONCENTRATE ON PROPERTY MANAGEMENT")
        words = text.split()
        for word in words:
            if word not in lexicon:
                # rule-based letter-to-sound for OOVs, stress stripped to
                # match the an4 dictionary's plain phone set
                lexicon[word] = [re.sub(r"\d", "", p)
                                 for p in letter_to_sound(word)]
        utts.append(("ctc_align_test", wav, words))
    return utts, lexicon


def load_soak_mix(data_dir: str, lexicon: dict, n_utts: int, seed: int = 0):
    """Mix-in utterances from the soak synthetic corpus (VERDICT r2 #5:
    a corpus-scale starter needs more than 19.4 s — the formant-synthesized
    corpus shares the CMU phone inventory, so its ~25 min of speech can
    flat-start the models while the real AN4 audio anchors them).

    Returns [(uid, wav, words)] where each "word" is a phone mapped through
    an identity lexicon entry, so the HTK path and to_phones() treat the
    phone transcripts uniformly.
    """
    from a3t_tpu.data.fileio import SoundScpReader, read_2column_text

    wav_r = SoundScpReader(os.path.join(data_dir, "wav.scp"))
    text = read_2column_text(os.path.join(data_dir, "text"))
    uids = sorted(u for u in wav_r.keys() if u in text)
    rng = np.random.default_rng(seed)
    picked = [uids[i] for i in rng.permutation(len(uids))[:n_utts]]
    utts = []
    for uid in picked:
        fs, wav = wav_r[uid]
        assert fs == 16000, (uid, fs)
        words = [re.sub(r"\d", "", p).upper() for p in text[uid].split()]
        for w in words:
            lexicon.setdefault(w, [w])
        utts.append((f"soak_{uid}", wav.astype(np.float32), words))
    return utts


def to_phones(words: list[str], lexicon: dict) -> list[str]:
    """sil word1 word2 ... sil, lower-cased phones."""
    phones = ["sil"]
    for w in words:
        phones.extend(p.lower() for p in lexicon[w])
    phones.append("sil")
    return phones


def word_phone_seq(words: list[str], lexicon: dict):
    """[(word, [phones])] incl. the boundary silences."""
    out = [("<sil>", ["sil"])]
    out += [(w, [p.lower() for p in lexicon[w]]) for w in words]
    out.append(("<sil>", ["sil"]))
    return out


# ---------------------------------------------------------------------------
# HTK flat-start system
# ---------------------------------------------------------------------------

HTK_CONFIG = """SOURCEKIND = WAVEFORM
SOURCEFORMAT = WAVE
SOURCERATE = 625.0
TARGETKIND = PLP_0_D_A_Z
TARGETRATE = 100000.0
WINDOWSIZE = 250000.0
ZMEANSOURCE = T
USEHAMMING = T
PREEMCOEF = 0.97
NUMCHANS = 20
LPCORDER = 12
USEPOWER = T
"""

VECSIZE = 39  # PLP_0_D_A_Z: (12 + C0) * 3


def _proto(n_states: int = 3) -> str:
    total = n_states + 2
    mean = " ".join(["0.0"] * VECSIZE)
    var = " ".join(["1.0"] * VECSIZE)
    lines = [f"~o <VecSize> {VECSIZE} <PLP_0_D_A_Z>", '~h "proto"',
             "<BeginHMM>", f"<NumStates> {total}"]
    for s in range(2, 2 + n_states):
        lines += [f"<State> {s}", f"<Mean> {VECSIZE}", mean,
                  f"<Variance> {VECSIZE}", var]
    lines.append(f"<TransP> {total}")
    for i in range(total):
        row = ["0.0"] * total
        if i == 0:
            row[1] = "1.0"
        elif i < total - 1:
            row[i] = "0.6"
            row[i + 1] = "0.4"
        lines.append(" ".join(row))
    lines.append("<EndHMM>")
    return "\n".join(lines) + "\n"


def run_htk(utts, lexicon, workdir: str, n_herest: int = 8,
            transcripts: dict | None = None):
    """Flat-start HTK monophone training + forced alignment.

    ``transcripts`` optionally overrides the phone sequence per uid
    (default: sil + lexicon phones + sil, to_phones).  Returns
    {uid: [(phone, start_sec, end_sec), ...]}.
    """
    import wave as wavemod

    d = os.path.join(workdir, "htk")
    os.makedirs(d, exist_ok=True)
    cfg = os.path.join(d, "config")
    with open(cfg, "w") as f:
        f.write(HTK_CONFIG)

    def phones_of(uid, words):
        if transcripts and uid in transcripts:
            return transcripts[uid]
        return to_phones(words, lexicon)

    phones = sorted({p for uid, _, ws in utts
                     for p in phones_of(uid, ws)})
    with open(os.path.join(d, "monophones"), "w") as f:
        f.write("\n".join(phones) + "\n")
    # phone-level dict (phone "words" map to themselves)
    with open(os.path.join(d, "dict"), "w") as f:
        for p in phones:
            f.write(f"{p} {p}\n")

    # wavs + HCopy feature extraction
    scp, lab_entries = [], []
    for uid, wav, words in utts:
        wpath = os.path.join(d, uid + ".wav")
        with wavemod.open(wpath, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((wav * 32767).astype("<i2").tobytes())
        scp.append((wpath, os.path.join(d, uid + ".plp")))
    with open(os.path.join(d, "hcopy.scp"), "w") as f:
        for a, b in scp:
            f.write(f"{a} {b}\n")
    subprocess.run([f"{HTK}/HCopy", "-C", cfg, "-S",
                    os.path.join(d, "hcopy.scp")], check=True,
                   capture_output=True)
    with open(os.path.join(d, "train.scp"), "w") as f:
        for _, b in scp:
            f.write(b + "\n")

    # phone MLF
    with open(os.path.join(d, "phones.mlf"), "w") as f:
        f.write("#!MLF!#\n")
        for uid, _, words in utts:
            f.write(f'"*/{uid}.lab"\n')
            f.write("\n".join(phones_of(uid, words)))
            f.write("\n.\n")

    # flat start
    os.makedirs(os.path.join(d, "hmm0"), exist_ok=True)
    with open(os.path.join(d, "proto"), "w") as f:
        f.write(_proto())
    subprocess.run([f"{HTK}/HCompV", "-f", "0.01", "-m",
                    "-S", os.path.join(d, "train.scp"),
                    "-M", os.path.join(d, "hmm0"),
                    os.path.join(d, "proto")], check=True,
                   capture_output=True)
    with open(os.path.join(d, "hmm0", "proto")) as f:
        proto_trained = f.read()
    body = proto_trained[proto_trained.index("<BEGINHMM>"):] \
        if "<BEGINHMM>" in proto_trained \
        else proto_trained[proto_trained.index("<BeginHMM>"):]
    with open(os.path.join(d, "hmm0", "vFloors")) as f:
        vfloors = f.read()
    with open(os.path.join(d, "hmm0", "macros"), "w") as f:
        f.write(f"~o <VecSize> {VECSIZE} <PLP_0_D_A_Z>\n" + vfloors)
    with open(os.path.join(d, "hmm0", "hmmdefs"), "w") as f:
        for p in phones:
            f.write(f'~h "{p}"\n' + body + "\n")

    # embedded re-estimation
    prev = os.path.join(d, "hmm0")
    for i in range(1, n_herest + 1):
        cur = os.path.join(d, f"hmm{i}")
        os.makedirs(cur, exist_ok=True)
        subprocess.run(
            [f"{HTK}/HERest", "-I", os.path.join(d, "phones.mlf"),
             "-t", "250.0", "150.0", "1000.0",
             "-S", os.path.join(d, "train.scp"),
             "-H", os.path.join(prev, "macros"),
             "-H", os.path.join(prev, "hmmdefs"),
             "-M", cur, os.path.join(d, "monophones")],
            check=True, capture_output=True)
        prev = cur

    # forced alignment (the reference's HVite flags, align_english.py:194)
    aligned = os.path.join(d, "aligned.mlf")
    subprocess.run(
        [f"{HTK}/HVite", "-a", "-m", "-t", "10000.0", "10000.0", "100000.0",
         "-I", os.path.join(d, "phones.mlf"),
         "-H", os.path.join(prev, "macros"),
         "-H", os.path.join(prev, "hmmdefs"),
         "-i", aligned, "-S", os.path.join(d, "train.scp"),
         os.path.join(d, "dict"), os.path.join(d, "monophones")],
        check=True, capture_output=True)

    # parse (100 ns units; +12.5 ms window-centering like the reference's
    # (t/1000+125)/10000 correction, align_english.py:216-217)
    out = {}
    cur_uid = None
    with open(aligned) as f:
        for line in f:
            line = line.strip()
            m = re.match(r'"\S*/(\S+)\.rec"', line)
            if m:
                cur_uid = m.group(1)
                out[cur_uid] = []
                continue
            parts = line.split()
            if cur_uid and len(parts) >= 3 and parts[0].isdigit():
                s, e = int(parts[0]), int(parts[1])
                if s == e:
                    continue
                out[cur_uid].append(
                    (parts[2], (s / 1000 + 125) / 10000,
                     (e / 1000 + 125) / 10000))
    return out


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------

def energy_endpoints(wav: np.ndarray, fs: int = 16000,
                     margin_db: float = 30.0) -> tuple[float, float]:
    """Objective speech onset/offset from smoothed energy (a VAD ground
    truth both aligners can be scored against)."""
    en = np.convolve(wav ** 2, np.ones(1600) / 1600, "same")
    db = 10 * np.log10(en + 1e-9)
    above = np.nonzero(db > db.max() - margin_db)[0]
    return above[0] / fs, above[-1] / fs


def compare(utts, lexicon, htk_out, aligner):
    """Boundary agreement between the two aligners + objective speech
    onset/offset accuracy of each against the energy envelope."""
    diffs = []
    per_utt = {}
    onset_err = {"native": [], "htk": []}
    offset_err = {"native": [], "htk": []}
    for uid, wav, words in utts:
        phones = to_phones(words, lexicon)
        start, end = aligner.align(wav, phones)
        t_on, t_off = energy_endpoints(wav)
        onset_err["native"].append(abs(start[1] - t_on) * 1000)
        offset_err["native"].append(abs(end[-2] - t_off) * 1000)
        htk = htk_out.get(uid)
        if htk is None or len(htk) != len(phones) or \
                [p for p, _, _ in htk] != phones:
            per_utt[uid] = None  # sequence mismatch; skip
            continue
        onset_err["htk"].append(abs(htk[1][1] - t_on) * 1000)
        offset_err["htk"].append(abs(htk[-2][2] - t_off) * 1000)
        htk_bounds = np.asarray([s for _, s, _ in htk[1:]])
        my_bounds = np.asarray(start[1:], float)
        d = np.abs(htk_bounds - my_bounds) * 1000.0  # ms
        diffs.extend(d.tolist())
        per_utt[uid] = float(np.median(d))
    endpoint = {
        f"{sysname}_{which}_median_ms": float(np.median(v))
        for which, errs in (("onset", onset_err), ("offset", offset_err))
        for sysname, v in errs.items() if v
    }
    return np.asarray(diffs), per_utt, endpoint


def build_splice_trials(utts, seed=0, zero_gap_prob: float = 0.0,
                        n_trials: int = 6):
    """Construct the ground-truth splices: energy-trimmed single-word
    recordings re-joined with known gaps.  Returns a list of
    (wav, words, true_onset_seconds)."""
    rng = np.random.default_rng(seed)
    single = [(uid, wav, words) for uid, wav, words in utts
              if len(words) == 1]
    segments = []
    for uid, wav, words in single:
        t_on, t_off = energy_endpoints(wav)
        seg = wav[int(t_on * 16000): int(t_off * 16000)]
        segments.append((words[0], seg))

    trials = []
    for trial in range(n_trials):
        order = rng.permutation(len(segments))
        gap = rng.uniform(0.15, 0.4)
        lead = np.zeros(int(gap * 16000), np.float32)
        pieces, words, true_onsets = [lead], [], []
        t = len(lead)
        for j in order:
            word, seg = segments[j]
            true_onsets.append(t / 16000.0)
            g = 0.0 if rng.uniform() < zero_gap_prob else gap
            sil = np.zeros(int(g * 16000), np.float32)
            pieces += [seg, sil]
            words.append(word)
            t += len(seg) + len(sil)
        trials.append((np.concatenate(pieces), words, true_onsets))
    return trials


def splice_eval(utts, lexicon, aligner, htk_dir_utts=None, seed=0,
                zero_gap_prob: float = 0.0, optional_sil: bool = False):
    """Exact-ground-truth word-boundary test on real speech.

    The single-word AN4 recordings are energy-trimmed and spliced together
    with silence gaps, so true word onsets are known by construction; the
    native aligner's recovered onsets are scored against them.

    ``zero_gap_prob`` makes that fraction of the inter-word gaps
    zero-length — natural sentences mix pauses and run-ons, and a
    MANDATORY inter-word silence topology must then invent a pause
    that is not there.  ``optional_sil=True`` aligns with the HVite-style
    optional-silence topology instead (the Viterbi path may skip any
    inter-word sil), which handles both cases.  Returns onset-error
    stats in ms.
    """
    errors = []
    for wav, words, true_onsets in build_splice_trials(
            utts, seed=seed, zero_gap_prob=zero_gap_prob):
        phones, flags, word_start_idx = ["sil"], [False], []
        for w in words:
            word_start_idx.append(len(phones))
            phones.extend(p.lower() for p in lexicon[w])
            flags.extend([False] * len(lexicon[w]))
            phones.append("sil")
            flags.append(optional_sil)
        start, _ = aligner.align(
            wav, phones, optional=flags if optional_sil else None)
        for wi, si in enumerate(word_start_idx):
            errors.append((start[si] - true_onsets[wi]) * 1000.0)
    signed = np.asarray(errors)
    e = np.abs(signed)
    return {
        "n_onsets": int(len(e)),
        "median_ms": float(np.median(e)),
        "p90_ms": float(np.percentile(e, 90)),
        "within_30ms_pct": float((e <= 30).mean() * 100),
        "within_50ms_pct": float((e <= 50).mean() * 100),
        # a consistent sign = front-end framing offset, correctable like
        # HTK's fixed timestamp shift (align_english.py:127-128)
        "median_signed_ms": float(np.median(signed)),
        # random component after removing the systematic offset — the
        # part a fixed correction constant cannot fix
        "bias_corrected_median_ms": float(
            np.median(np.abs(signed - np.median(signed)))),
        "bias_corrected_p90_ms": float(
            np.percentile(np.abs(signed - np.median(signed)), 90)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exp/an4_aligner")
    ap.add_argument("--mixtures", type=int, default=2)
    ap.add_argument("--em-iters", type=int, default=10)
    ap.add_argument("--mix-soak", default="",
                    help="soak-corpus train dir to mix into BOTH systems' "
                         "training (native + HTK); evaluation stays on the "
                         "real AN4 utterances")
    ap.add_argument("--mix-utts", type=int, default=600)
    ap.add_argument("--htk-iters", type=int, default=8)
    ap.add_argument("--htk-splice", action="store_true",
                    help="ground-truth splice eval of HTK itself: train "
                         "the HTK flat-start system on an4 (+ --mix-soak) "
                         "plus the splice wavs, score its recovered word "
                         "onsets against the known truth, write "
                         "HTK_SPLICE.json")
    ap.add_argument("--eval-only", default="",
                    help="path to a trained aligner .bin: skip native+HTK "
                         "training, run the ground-truth splice evals "
                         "(mandatory vs optional inter-word silence, with "
                         "and without run-on zero-gaps) and write "
                         "ALIGNER_SPLICE.json")
    args = ap.parse_args()

    from a3t_tpu.align.native import NativeAligner

    os.makedirs(args.out, exist_ok=True)
    workdir = tempfile.mkdtemp(prefix="an4_")
    try:
        if args.eval_only:
            utts, lexicon = load_an4(workdir)
            aligner = NativeAligner.load(args.eval_only)
            report = {"model": args.eval_only}
            for zgp in (0.0, 0.5):
                for opt in (False, True):
                    key = (f"zero_gap_{int(zgp * 100)}pct_"
                           f"{'optional' if opt else 'mandatory'}_sil")
                    report[key] = splice_eval(
                        utts, lexicon, aligner,
                        zero_gap_prob=zgp, optional_sil=opt)
            out = os.path.join(args.out, "ALIGNER_SPLICE.json")
            with open(out, "w") as f:
                json.dump(report, f, indent=1)
            print(json.dumps(report, indent=1))
            return
        if args.htk_splice:
            utts, lexicon = load_an4(workdir)
            trials = build_splice_trials(utts, seed=0)
            corpus = list(utts)
            if args.mix_soak:
                corpus += load_soak_mix(args.mix_soak, lexicon,
                                        args.mix_utts)
            transcripts = {}
            word_starts = {}  # uid -> [(phone_index, true_onset_s)]
            for i, (wav, words, onsets) in enumerate(trials):
                uid = f"splice{i:02d}"
                phones, starts = ["sil"], []
                for w in words:
                    starts.append(len(phones))
                    phones.extend(p.lower() for p in lexicon[w])
                    phones.append("sil")  # the known inter-word gap
                transcripts[uid] = phones
                word_starts[uid] = list(zip(starts, onsets))
                corpus.append((uid, wav, words))
            htk_out = run_htk(corpus, lexicon, workdir,
                              n_herest=args.htk_iters,
                              transcripts=transcripts)
            signed = []
            for uid, pairs in word_starts.items():
                aligned = htk_out.get(uid, [])
                for pi, true_on in pairs:
                    if pi < len(aligned):
                        signed.append(
                            (aligned[pi][1] - true_on) * 1000.0)
            signed = np.asarray(signed)
            e = np.abs(signed)
            report = {
                "system": "htk flat-start (HCompV+HERest+HVite, the "
                          "reference's toolchain and flags)",
                "mixed_soak_utts": args.mix_utts if args.mix_soak else 0,
                "n_onsets": int(len(e)),
                "median_ms": float(np.median(e)),
                "p90_ms": float(np.percentile(e, 90)),
                "within_30ms_pct": float((e <= 30).mean() * 100),
                "within_50ms_pct": float((e <= 50).mean() * 100),
                "median_signed_ms": float(np.median(signed)),
                "bias_corrected_median_ms": float(
                    np.median(np.abs(signed - np.median(signed)))),
                "bias_corrected_p90_ms": float(
                    np.percentile(np.abs(signed - np.median(signed)), 90)),
            }
            out = os.path.join(args.out, "HTK_SPLICE.json")
            os.makedirs(args.out, exist_ok=True)
            with open(out, "w") as f:
                json.dump(report, f, indent=1)
            print(json.dumps(report, indent=1))
            return

        utts, lexicon = load_an4(workdir)
        real_utts = list(utts)
        if args.mix_soak:
            mix = load_soak_mix(args.mix_soak, lexicon, args.mix_utts)
            utts = real_utts + mix
            print(f"mixed in {len(mix)} soak utterances "
                  f"({sum(len(w) / 16000 for _, w, _ in mix):.0f}s)")
        print(f"{len(real_utts)} real utterances, "
              f"{sum(len(w) / 16000 for _, w, _ in real_utts):.1f}s real")

        phones = sorted({p for _, _, ws in utts
                         for p in to_phones(ws, lexicon)})
        aligner = NativeAligner(phones, 16000)
        lls = aligner.train(
            [(wav, to_phones(words, lexicon)) for _, wav, words in utts],
            n_iterations=args.em_iters, n_mixtures=args.mixtures,
            verbose=True)
        name = "aligner_mix.bin" if args.mix_soak else "aligner_an4.bin"
        aligner.save(os.path.join(args.out, name))

        htk_out = run_htk(utts, lexicon, workdir, n_herest=args.htk_iters)
        diffs, per_utt, endpoint = compare(real_utts, lexicon, htk_out,
                                           aligner)

        report = {
            "mixed_soak_utts": len(utts) - len(real_utts),
            "n_utterances": len(real_utts),
            "total_seconds": round(
                sum(len(w) / 16000 for _, w, _ in real_utts), 1),
            "n_boundaries": int(len(diffs)),
            "median_abs_diff_ms": float(np.median(diffs)),
            "mean_abs_diff_ms": float(np.mean(diffs)),
            "p90_abs_diff_ms": float(np.percentile(diffs, 90)),
            "within_20ms_pct": float((diffs <= 20).mean() * 100),
            "within_30ms_pct": float((diffs <= 30).mean() * 100),
            "endpoint_accuracy_vs_energy": endpoint,
            "splice_word_onset_accuracy": splice_eval(real_utts, lexicon,
                                                      aligner),
            "final_ll_per_frame": lls[-1],
            "per_utt_median_ms": per_utt,
        }
        with open(os.path.join(args.out, "ALIGNER_EVAL.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({k: v for k, v in report.items()
                          if k != "per_utt_median_ms"}, indent=1))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
