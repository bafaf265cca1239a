"""FLAC codec tests: Python encoder/decoder roundtrips over every
subframe/stereo/rice feature, cross-validation of the C++ decoder
(native/loader/flac.cc) against the Python codec, and the fileio /
format-stage integration.

Reference behavior being covered: espnet2/fileio/sound_scp.py reads
training audio through soundfile (libsndfile), whose recipes store
formatted audio as FLAC by default (egs2/TEMPLATE/tts1/scripts/audio/
format_wav_scp.sh ``audio_format=flac``).
"""

import os

import numpy as np
import pytest

from a3t_tpu.data.flac import is_flac, probe_flac, read_flac, write_flac


def _speechlike(rng, n):
    t = np.arange(n)
    x = (6000 * np.sin(t * 0.021) + 900 * np.sin(t * 0.37)
         + rng.normal(0, 60, n))
    return np.clip(x, -32768, 32767).astype(np.int16)


def _roundtrip(tmp_path, data, fs=16000, **kw):
    path = os.path.join(tmp_path, "t.flac")
    write_flac(path, fs, data, **kw)
    got_fs, got, bps = read_flac(path)
    assert got_fs == fs
    np.testing.assert_array_equal(np.asarray(data, np.int64),
                                  np.asarray(got, np.int64))
    return path, bps


def test_mono_roundtrip_and_compression(tmp_path, rng):
    x = _speechlike(rng, 20011)  # several blocks + odd tail
    path, bps = _roundtrip(str(tmp_path), x)
    assert bps == 16
    assert os.path.getsize(path) < 2 * len(x)  # actually compresses
    assert is_flac(path) and not is_flac(__file__)
    n, fs = probe_flac(path)
    assert (n, fs) == (len(x), 16000)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side", "auto"])
def test_stereo_decorrelation_modes(tmp_path, rng, mode):
    x = _speechlike(rng, 6007)
    st = np.stack([x, np.roll(x, 2) + rng.integers(-40, 40, len(x))], 1)
    st = np.clip(st, -32768, 32767).astype(np.int16)
    _roundtrip(str(tmp_path), st, stereo_mode=mode)


def test_constant_verbatim_and_wasted_bits(tmp_path, rng):
    # constant + silence blocks
    _roundtrip(str(tmp_path), np.concatenate(
        [np.full(4096, 77, np.int16), np.zeros(4096, np.int16),
         np.full(33, -9, np.int16)]))
    # pure noise forces verbatim / escape decisions
    _roundtrip(str(tmp_path), rng.integers(-32768, 32768, 3001)
               .astype(np.int16))
    # samples sharing trailing zero bits exercise the wasted-bits path
    _roundtrip(str(tmp_path), (rng.integers(-1024, 1024, 4096) * 32)
               .astype(np.int16))


def test_24bit_and_partition_orders(tmp_path, rng):
    x24 = rng.integers(-(1 << 23), 1 << 23, 4099).astype(np.int32)
    _, bps = _roundtrip(str(tmp_path), x24, bps=24)
    assert bps == 24
    tone = (1200 * np.sin(np.arange(8192) * 0.04)).astype(np.int16)
    for po in (0, 1, 4):
        _roundtrip(str(tmp_path), tone, partition_order=po)
    _roundtrip(str(tmp_path), tone, lpc_order=0)  # fixed-only encoder


def test_multibyte_frame_numbers(tmp_path, rng):
    # >128 frames -> 2-byte UTF-8-coded frame numbers in the header
    x = rng.integers(-300, 300, 16 * 140).astype(np.int16)
    _roundtrip(str(tmp_path), x, block_size=16)


def test_corruption_detected(tmp_path, rng):
    path, _ = _roundtrip(str(tmp_path), _speechlike(rng, 9000))
    buf = bytearray(open(path, "rb").read())
    buf[len(buf) // 2] ^= 0x55
    with pytest.raises(ValueError):
        read_flac(bytes(buf))
    with pytest.raises(ValueError):
        read_flac(b"RIFFnotflac")


def test_float_input_quantization(tmp_path, rng):
    xf = rng.uniform(-0.99, 0.99, 2000).astype(np.float32)
    path = os.path.join(str(tmp_path), "f.flac")
    write_flac(path, 22050, xf)
    _, got, _ = read_flac(path)
    want = np.clip(np.round(np.clip(xf, -1, 1) * 32768), -32768, 32767)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_fileio_read_wav_dispatches_flac(tmp_path, rng):
    from a3t_tpu.data.fileio import read_wav, write_2column_text
    from a3t_tpu.data.fileio import SoundScpReader

    x = _speechlike(rng, 5000)
    path = os.path.join(str(tmp_path), "u1.flac")
    write_flac(path, 16000, x)
    fs, wav = read_wav(path)
    assert fs == 16000 and wav.dtype == np.float32
    np.testing.assert_allclose(wav, x / 32768.0, atol=1e-7)
    # raw-int read
    fs, raw = read_wav(path, always_float=False)
    np.testing.assert_array_equal(raw, x.astype(np.int32))
    # scp reader mixes containers transparently
    scp_path = os.path.join(str(tmp_path), "wav.scp")
    write_2column_text(scp_path, {"u1": path})
    fs, wav2 = SoundScpReader(scp_path)["u1"]
    np.testing.assert_array_equal(wav, wav2)


def test_native_loader_decodes_flac(tmp_path, rng):
    """C++ decoder (flac.cc) vs the Python codec: probe + both batch
    output formats, mixed wav/flac registry."""
    from a3t_tpu.data.fileio import write_wav
    from a3t_tpu.data.native_loader import NativeWavLoader

    x1 = _speechlike(rng, 7000)
    x2 = rng.integers(-32768, 32768, 6500).astype(np.int16)  # noise
    x3 = _speechlike(rng, 6000)
    st = np.stack([x3, x3 + rng.integers(-9, 9, len(x3))], 1)
    st = np.clip(st, -32768, 32767).astype(np.int16)
    p1 = os.path.join(str(tmp_path), "a.flac")
    p2 = os.path.join(str(tmp_path), "b.flac")
    p3 = os.path.join(str(tmp_path), "c.flac")  # stereo: channel 0 taken
    p4 = os.path.join(str(tmp_path), "d.wav")   # mixed registry
    write_flac(p1, 16000, x1)
    write_flac(p2, 16000, x2, partition_order=3)
    write_flac(p3, 16000, st, stereo_mode="mid_side")
    write_wav(p4, 16000, x1 / 32768.0)

    ld = NativeWavLoader([p1, p2, p3, p4], n_threads=2)
    ns, sr = ld.probe()
    assert ns.tolist() == [7000, 6500, 6000, 7000]
    assert set(sr.tolist()) == {16000}
    outf, lens = ld.load_batch(range(4), 7000)
    outi, _ = ld.load_batch_i16(range(4), 7000)
    for i, ref in enumerate([x1, x2, st[:, 0]]):
        n = len(ref)
        assert lens[i] == n
        np.testing.assert_allclose(outf[i, :n], ref / 32768.0, atol=1e-7)
        np.testing.assert_array_equal(outi[i, :n], ref)
        assert not outf[i, n:].any()
    # truncation at max_samples
    outf2, lens2 = ld.load_batch([0], 1234)
    assert lens2[0] == 1234
    np.testing.assert_allclose(outf2[0], x1[:1234] / 32768.0, atol=1e-7)


def test_native_single_file_read_matches_python(tmp_path, rng):
    """loader_read_file (fileio.read_wav's FLAC fast path) vs the Python
    decoder, for flac AND wav containers."""
    from a3t_tpu.data.fileio import read_wav, write_wav
    from a3t_tpu.data.native_loader import read_file

    x = _speechlike(rng, 8000)
    fp = os.path.join(str(tmp_path), "s.flac")
    wp = os.path.join(str(tmp_path), "s.wav")
    write_flac(fp, 16000, x)
    write_wav(wp, 16000, x / 32768.0)  # write_wav re-quantizes (32767 scale)
    fs, wav = read_file(fp)
    assert fs == 16000 and wav.dtype == np.float32
    np.testing.assert_allclose(wav, x / 32768.0, atol=1e-7)
    # wav container: native decode == the scipy path on the same file
    from scipy.io import wavfile

    _, on_disk = wavfile.read(wp)
    fs, wav = read_file(wp)
    assert fs == 16000
    np.testing.assert_allclose(wav, on_disk / 32768.0, atol=1e-7)
    # and the fileio dispatch lands on the same samples
    fs, via_fileio = read_wav(fp)
    np.testing.assert_array_equal(via_fileio, read_file(fp)[1])


def test_native_loader_rejects_corrupt_flac(tmp_path, rng):
    from a3t_tpu.data.native_loader import NativeWavLoader

    path = os.path.join(str(tmp_path), "bad.flac")
    write_flac(path, 16000, _speechlike(rng, 4000))
    buf = bytearray(open(path, "rb").read())
    buf[-60] ^= 0xFF  # corrupt a frame body; CRC-16 must catch it
    open(path, "wb").write(bytes(buf))
    ld = NativeWavLoader([path])
    with pytest.raises(IOError):
        ld.load_batch([0], 4000)


def test_format_stage_flac_output_and_input(tmp_path, rng):
    """format_data_dir resamples a flac source and can emit flac storage
    (reference format_wav_scp.sh audio_format=flac)."""
    from a3t_tpu.data.fileio import read_2column_text, read_wav
    from a3t_tpu.data.format_wav import format_data_dir

    src = os.path.join(str(tmp_path), "data")
    os.makedirs(src)
    t = np.arange(48000)
    wav48 = (0.3 * np.sin(2 * np.pi * 220 * t / 48000)).astype(np.float32)
    write_flac(os.path.join(src, "u1.flac"), 48000, wav48)
    with open(os.path.join(src, "wav.scp"), "w") as f:
        f.write(f"u1 {os.path.join(src, 'u1.flac')}\n")
    with open(os.path.join(src, "text"), "w") as f:
        f.write("u1 AA BB\n")

    out = os.path.join(str(tmp_path), "dump")
    report = format_data_dir(src, out, fs=24000, audio_format="flac")
    assert report["source_fs_counts"] == {48000: 1}
    scp = read_2column_text(os.path.join(out, "wav.scp"))
    assert scp["u1"].endswith(".flac")
    fs, wav = read_wav(scp["u1"])
    assert fs == 24000 and abs(len(wav) - 24000) <= 2
    # the resampled tone keeps its frequency: count zero crossings
    zc = int((np.diff(np.signbit(wav)) != 0).sum())
    assert abs(zc - 440) < 8
