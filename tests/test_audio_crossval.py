"""Cross-validation of the in-build AAC stack against FFmpeg's decoder
(via the optional native bridge, native/avdec.cpp).

Before this suite, the HE-AAC layers (SBR, parametric stereo) were
validated analytically only; libavcodec provides the first independent
decoder for the same bitstreams. Expectations are tolerance-based:

- AAC-LC: waveforms agree closely (implementation float rounding only).
- SBR: the 48 kHz reconstruction correlates > 0.999 with FFmpeg's
  (QMF banks + HF patching + envelope semantics all line up).
- PS: the MID channel matches tightly; the SIDE channel is built from
  an all-pass decorrelator whose per-sample output legitimately differs
  between implementations — asserted by strong correlation and energy,
  not sample equality (FFmpeg's own PS differs from libfaad the same
  way).
"""

from __future__ import annotations

import numpy as np
import pytest

from aac_gen import make_adts_frame, make_sce
from sbr_gen import append_sbr_fil, sbr_payload, sbr_ps_payload

from amatsukaze_tpu.audio.aac import AacLcDecoder
from amatsukaze_tpu.audio.sbr import (
    FreqTables,
    master_frequency_table,
    qmf_start_channel,
    qmf_stop_channel,
)


def _bridge():
    from amatsukaze_tpu.video.avdec import avdec_available

    if not avdec_available():
        pytest.skip("FFmpeg bridge unavailable")
    from amatsukaze_tpu.video.avdec import AvAacDecoder

    return AvAacDecoder()


def _bands():
    k0 = qmf_start_channel(5, 1, 48000)
    k2 = qmf_stop_channel(3, 48000, k0)
    fm = master_frequency_table(k0, k2, 2, 1)
    ft = FreqTables(fm, 0, k0, k2, 2, 48000)
    return len(ft.f_low) - 1, ft.n_q


def _run_both(frame, n=16, stereo=False):
    ours, ff = AacLcDecoder(), _bridge()
    o_pcm, f_pcm = [], []
    for _ in range(n):
        res = ours.decode(frame)
        assert res is not None
        pcm = np.frombuffer(res.pcm, "<i2").astype(np.float32) / 32768.0
        o_pcm.append(pcm.reshape(-1, 2) if stereo else pcm)
        r = ff.decode(frame)
        if r is not None:
            f_pcm.append(r[0] if stereo else r[0][:, 0])
    return np.concatenate(o_pcm), np.concatenate(f_pcm)


def _corr_snr(a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    c = float(np.dot(a, b)) / (
        float(np.sqrt(np.dot(a, a) * np.dot(b, b))) + 1e-12)
    err = np.mean((a - b) ** 2)
    sig = np.mean(b ** 2)
    return c, 10 * np.log10(sig / max(err, 1e-18))


class TestAgainstFFmpegAudio:
    def test_aac_lc(self):
        def body(w):
            make_sce(w, {4: [30, 30, 30, 30], 10: [25] * 8},
                     global_gain=140, sr_index=3, codebook=11, max_sfb=40)

        o, f = _run_both(make_adts_frame(body, sr_index=3), n=12)
        c, snr = _corr_snr(o, f)
        assert c > 0.999 and snr > 40, (c, snr)

    def test_he_aac_v1_sbr(self):
        n_env, n_noise = _bands()
        payload = sbr_payload(env_start=25, n_env_bands=n_env,
                              n_noise_bands=n_noise)

        def body(w):
            make_sce(w, {8: [40, 40, 40, 40]}, global_gain=140,
                     sr_index=6, codebook=11, max_sfb=40)
            append_sbr_fil(w, payload)

        o, f = _run_both(make_adts_frame(body, sr_index=6))
        assert len(o) == len(f)  # SBR doubled rate on both sides
        c, snr = _corr_snr(o, f)
        assert c > 0.999 and snr > 25, (c, snr)

    def test_he_aac_v2_ps(self):
        n_env, n_noise = _bands()
        payload = sbr_ps_payload(env_start=25, n_env_bands=n_env,
                                 n_noise_bands=n_noise,
                                 iid_index=4, icc_index=2)

        def body(w):
            make_sce(w, {8: [40, 40, 40, 40]}, global_gain=140,
                     sr_index=6, codebook=11, max_sfb=40)
            append_sbr_fil(w, payload)

        o, f = _run_both(make_adts_frame(body, sr_index=6), stereo=True)
        assert o.shape == f.shape  # stereo out on both sides
        mid_c, mid_snr = _corr_snr((o[:, 0] + o[:, 1]) / 2,
                                   (f[:, 0] + f[:, 1]) / 2)
        side_c, _ = _corr_snr((o[:, 0] - o[:, 1]) / 2,
                              (f[:, 0] - f[:, 1]) / 2)
        assert mid_c > 0.99 and mid_snr > 20, (mid_c, mid_snr)
        assert side_c > 0.8, side_c
        # Stereo image energy: loose per-channel bound. Probing showed
        # IID gains match FFmpeg exactly (0/4/10/18 dB across indices);
        # the residual per-channel delta on tonal content comes from the
        # direct-vs-decorrelated cross term, whose sign depends on the
        # decorrelator's phase response (implementation detail).
        for ch in range(2):
            ro = float(np.sqrt(np.mean(o[:, ch] ** 2)))
            rf = float(np.sqrt(np.mean(f[:, ch] ** 2)))
            assert 0.5 < ro / rf < 2.0, (ch, ro, rf)

    def test_ps_iid_gains_match_ffmpeg_exactly(self):
        n_env, n_noise = _bands()
        for iid, expect_db in ((2, 4.0), (4, 10.0), (6, 18.0)):
            payload = sbr_ps_payload(env_start=25, n_env_bands=n_env,
                                     n_noise_bands=n_noise,
                                     iid_index=iid, icc_index=0)

            def body(w):
                make_sce(w, {8: [40, 40, 40, 40]}, global_gain=140,
                         sr_index=6, codebook=11, max_sfb=40)
                append_sbr_fil(w, payload)

            o, f = _run_both(make_adts_frame(body, sr_index=6), n=10,
                             stereo=True)
            o, f = o[4096:], f[4096:]
            for name, x in (("ours", o), ("ffmpeg", f)):
                r = np.sqrt((x ** 2).mean(0))
                db = 20 * np.log10(r[0] / r[1])
                assert abs(db - expect_db) < 0.5, (name, iid, db)


class TestInbuildAacEncoder:
    def test_wav_to_adts_round_trip(self, tmp_path):
        """aac_shim: WAV stdin -> ADTS; decoded by the in-build AAC
        decoder (LC) and checked against the source tone."""
        _bridge()  # skip when no bridge
        import io as _io
        import subprocess
        import sys as _sys

        from amatsukaze_tpu.io.wave import wave_header

        sr, ch, n = 48000, 2, 48000
        t = np.arange(n)
        pcm = (8000 * np.sin(2 * np.pi * 440 * t / sr))[:, None]
        pcm = pcm.repeat(2, 1).astype("<i2")
        wav = wave_header(ch, sr, 16, n) + pcm.tobytes()
        out = tmp_path / "a.aac"
        r = subprocess.run(
            [_sys.executable, "-m", "amatsukaze_tpu.tools.aac_shim",
             "-b", "192000", "-o", str(out), "-"],
            input=wav, capture_output=True, timeout=300)
        assert r.returncode == 0, r.stderr.decode()
        data = out.read_bytes()
        assert data[:2] == b"\xff\xf1"  # ADTS sync

        # decode with the IN-BUILD decoder and check the tone survives
        from amatsukaze_tpu.audio.aac import AacLcDecoder

        dec = AacLcDecoder()
        outs = []
        i = 0
        while i + 7 <= len(data):
            ln = (((data[i + 3] & 3) << 11) | (data[i + 4] << 3)
                  | (data[i + 5] >> 5))
            res = dec.decode(data[i:i + ln])
            if res is not None:
                outs.append(np.frombuffer(res.pcm, "<i2")
                            .astype(np.float32).reshape(-1, 2))
            i += ln
        got = np.concatenate(outs) / 32768.0
        ref = pcm.astype(np.float32) / 32768.0
        best = -9.0
        for lag in range(0, 4096, 1):
            a = got[lag:lag + 20000, 0]
            b = ref[:len(a), 0]
            m = min(len(a), len(b))
            if m < 10000:
                break
            c = float(np.dot(a[:m], b[:m])) / (
                float(np.sqrt(np.dot(a[:m], a[:m]) * np.dot(b[:m], b[:m])))
                + 1e-12)
            best = max(best, c)
        assert best > 0.97, best
