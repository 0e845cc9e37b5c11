"""Native SBR decoder differential: the C++ engine (native/aacsbr.inc)
vs the Python oracle (audio/sbr.py) on the synthetic HE-AAC fixtures —
the same native-vs-oracle pattern as the LC engine (ref capability:
libfaad's SBR_DEC build, /root/reference/libfaad/sbr_dec.c)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from aac_gen import make_adts_frame, make_sce  # noqa: E402
from sbr_gen import append_sbr_fil, sbr_payload, sbr_ps_payload  # noqa: E402

from amatsukaze_tpu.audio.aac import AacLcDecoder  # noqa: E402
from amatsukaze_tpu.audio.aac_native import (  # noqa: E402
    NativeAacDecoder,
    native_available,
)
from amatsukaze_tpu.audio.sbr import (  # noqa: E402
    FreqTables,
    master_frequency_table,
    qmf_start_channel,
    qmf_stop_channel,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native decoder not built")

SR_INDEX = 6  # 24 kHz core -> 48 kHz output


def _tables():
    k0 = qmf_start_channel(5, 1, 48000)
    k2 = qmf_stop_channel(3, 48000, k0)
    fm = master_frequency_table(k0, k2, 2, 1)
    return FreqTables(fm, 0, k0, k2, 2, 48000)


def _stream(payload_bits, n_frames=8, gain=140):
    def body(w):
        make_sce(w, {8: [40, 40, 40, 40]}, global_gain=gain,
                 sr_index=SR_INDEX, codebook=11, max_sfb=40)
        append_sbr_fil(w, payload_bits)
    return [make_adts_frame(body, sr_index=SR_INDEX)] * n_frames


def _diff(frames):
    """Decode the same frames with both engines; return max abs PCM
    difference over the stream (int16 units)."""
    py = AacLcDecoder()
    nat = NativeAacDecoder()
    worst = 0.0
    for i, fr in enumerate(frames):
        a = py.decode(fr)
        b = nat.decode(fr)
        assert (a is None) == (b is None), f"frame {i} presence mismatch"
        if a is None:
            continue
        assert a.sample_rate == b.sample_rate, f"frame {i} rate"
        assert a.num_channels == b.num_channels
        pa = np.frombuffer(a.pcm, "<i2").astype(np.int32)
        pb = np.frombuffer(b.pcm, "<i2").astype(np.int32)
        assert len(pa) == len(pb), f"frame {i} length"
        worst = max(worst, float(np.abs(pa - pb).max()))
    return worst


class TestNativeSbrDifferential:
    def test_basic_single_envelope(self):
        t = _tables()
        p = sbr_payload(env_start=25, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_multi_envelope(self):
        t = _tables()
        p = sbr_payload(env_start=25, num_env=2, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_high_freq_res(self):
        t = _tables()
        p = sbr_payload(env_start=22, freq_res=1, n_env_bands=t.n_high,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_noise_floor_heavy(self):
        t = _tables()
        p = sbr_payload(env_start=28, noise_start=5, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_inverse_filtering(self):
        t = _tables()
        p = sbr_payload(env_start=25, invf_mode=2, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_amp_res_0(self):
        t = _tables()
        p = sbr_payload(env_start=50, amp_res=0, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_alternate_header(self):
        k0 = qmf_start_channel(6, 1, 48000)
        k2 = qmf_stop_channel(4, 48000, k0)
        fm = master_frequency_table(k0, k2, 1, 0)
        t = FreqTables(fm, 0, k0, k2, 3, 48000)
        p = sbr_payload(start_freq=6, stop_freq=4, freq_scale=1,
                        alter_scale=0, noise_bands=3, env_start=25,
                        n_env_bands=t.n_low, n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_headerless_upsample_only(self):
        # frames with SBR fill but no header yet: both engines must
        # upsample-only identically
        t = _tables()
        p = sbr_payload(header=False, env_start=25, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)
        assert _diff(_stream(p)) <= 1

    def test_mixed_header_then_headerless(self):
        t = _tables()
        with_h = sbr_payload(env_start=25, n_env_bands=t.n_low,
                             n_noise_bands=t.n_q)
        without = sbr_payload(header=False, env_start=25,
                              n_env_bands=t.n_low, n_noise_bands=t.n_q)
        frames = _stream(with_h, 4) + _stream(without, 4)
        assert _diff(frames) <= 1

    def test_dual_mono_two_sce(self):
        t = _tables()
        p = sbr_payload(env_start=25, n_env_bands=t.n_low,
                        n_noise_bands=t.n_q)

        def body(w):
            make_sce(w, {8: [40, 40, 40, 40]}, global_gain=140,
                     sr_index=SR_INDEX, codebook=11, max_sfb=40)
            append_sbr_fil(w, p)
            make_sce(w, {10: [38, 38, 38, 38]}, global_gain=138,
                     sr_index=SR_INDEX, codebook=11, max_sfb=40)
            append_sbr_fil(w, p)
        frames = [make_adts_frame(body, sr_index=SR_INDEX,
                                  channel_config=0)] * 6
        assert _diff(frames) <= 1

    def test_ps_stream_decodes_natively(self):
        """HE-AAC v2: the native engine decodes parametric stereo itself
        (aacps.inc) and must match the Python oracle exactly."""
        t = _tables()
        pp = sbr_ps_payload(env_start=25, n_env_bands=t.n_low,
                            n_noise_bands=t.n_q)
        frames = _stream(pp, 6)
        py = AacLcDecoder()
        nat = NativeAacDecoder()
        for fr in frames:
            a = py.decode(fr)
            b = nat.decode(fr)
            if a is None:
                assert b is None
                continue
            assert b.num_channels == a.num_channels  # 2 via PS
            assert np.array_equal(np.frombuffer(a.pcm, "<i2"),
                                  np.frombuffer(b.pcm, "<i2"))


class TestNativePsDifferential:
    """The native parametric-stereo decoder (native/aacps.inc) vs the
    Python oracle (audio/ps.py): the whole HE-AAC v2 chain decodes
    natively now."""

    def _ps_frames(self, n=8, **kw):
        t = _tables()
        pp = sbr_ps_payload(env_start=25, n_env_bands=t.n_low,
                            n_noise_bands=t.n_q, **kw)
        return _stream(pp, n)

    def _exact(self, frames):
        py = AacLcDecoder()
        nat = NativeAacDecoder()
        worst = 0
        for i, fr in enumerate(frames):
            a = py.decode(fr)
            b = nat.decode(fr)
            assert (a is None) == (b is None)
            if a is None:
                continue
            assert b.num_channels == a.num_channels, f"frame {i}"
            assert b.sample_rate == a.sample_rate
            pa = np.frombuffer(a.pcm, "<i2").astype(np.int32)
            pb = np.frombuffer(b.pcm, "<i2").astype(np.int32)
            worst = max(worst, int(np.abs(pa - pb).max()))
        return worst

    def test_flat_ps(self):
        assert self._exact(self._ps_frames()) <= 1

    def test_iid_panning(self):
        assert self._exact(self._ps_frames(iid_index=5)) <= 1
        assert self._exact(self._ps_frames(iid_index=-6)) <= 1

    def test_icc_decorrelation(self):
        assert self._exact(self._ps_frames(icc_index=4)) <= 1
        assert self._exact(self._ps_frames(icc_index=7)) <= 1

    def test_mode1_20_bands(self):
        assert self._exact(self._ps_frames(iid_mode=1, icc_mode=1)) <= 1

    def test_headerless_continuation(self):
        t = _tables()
        with_h = sbr_ps_payload(env_start=25, n_env_bands=t.n_low,
                                n_noise_bands=t.n_q, iid_index=3,
                                icc_index=2)
        without = sbr_ps_payload(env_start=25, n_env_bands=t.n_low,
                                 n_noise_bands=t.n_q, ps_header=False)
        frames = _stream(with_h, 4) + _stream(without, 4)
        assert self._exact(frames) <= 1

    def test_stereo_output_from_mono_sce(self):
        res = NativeAacDecoder().decode(self._ps_frames(1)[0])
        # even frame 1 (before any process history) emits 2 channels
        assert res.num_channels == 2
        assert res.sample_rate == 48000
        assert len(np.frombuffer(res.pcm, "<i2")) == 2048 * 2
