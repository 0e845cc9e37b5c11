"""Native (C++) AAC decoder vs the pure-Python oracle: differential tests
over the full syntax matrix. The native engine (native/aacdec.cpp) must be
bit-identical in elements/bit-ranges and within 1 LSB in PCM (the same
tolerance the reference applies to libfaad output,
AmatsukazeTestImpl.hpp:151-231)."""

import numpy as np
import pytest

import aac_gen
from amatsukaze_tpu.audio import aac_tables as T
from amatsukaze_tpu.audio.aac import (
    EIGHT_SHORT,
    LONG_START,
    LONG_STOP,
    ONLY_LONG,
    AacLcDecoder,
)
from amatsukaze_tpu.audio.aac_native import (
    NativeAacDecoder,
    make_decoder,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not buildable here")

SWB_L = T.SWB_OFFSETS[(1024, 48000)]
SWB_S = T.SWB_OFFSETS[(128, 48000)]


def compare(frames, max_lsb=1):
    """Decode with both engines; assert metadata identical, PCM within
    max_lsb. Returns the native results."""
    py = AacLcDecoder()
    nat = NativeAacDecoder()
    outs = []
    for i, f in enumerate(frames):
        a = py.decode(f)
        b = nat.decode(f)
        assert (a is None) == (b is None), f"frame {i}: {a} vs {b}"
        if a is None:
            outs.append(None)
            continue
        assert a.elements == b.elements, f"frame {i}"
        assert a.element_bits == b.element_bits, f"frame {i}"
        assert a.num_channels == b.num_channels
        assert a.sample_rate == b.sample_rate
        pa = np.frombuffer(a.pcm, "<i2").astype(np.int32)
        pb = np.frombuffer(b.pcm, "<i2").astype(np.int32)
        d = int(np.abs(pa - pb).max())
        assert d <= max_lsb, f"frame {i}: PCM diff {d} LSB"
        outs.append(b)
    return outs


def rand_bands(rng, maxv=12, n=40, short=False):
    swb = SWB_S if short else SWB_L
    mul = 8 if short else 1
    return {
        sfb: [int(v) for v in rng.integers(-maxv, maxv + 1,
                                           size=(swb[sfb + 1] - swb[sfb]) * mul)]
        for sfb in range(n)
    }


class TestDifferential:
    def test_silence(self):
        res = compare([aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, {}))] * 3)
        assert all(r is not None for r in res)

    @pytest.mark.parametrize("cb", list(range(1, 12)))
    def test_every_codebook(self, cb):
        mv = {1: 1, 2: 1, 3: 2, 4: 2, 5: 4, 6: 4, 7: 7, 8: 7,
              9: 12, 10: 12, 11: 300}[cb]
        rng = np.random.default_rng(cb)
        lo = -mv if cb in (1, 2, 5, 6, 11) else 0
        bands = {sfb: [int(v) for v in rng.integers(
            lo, mv + 1, size=SWB_L[sfb + 1] - SWB_L[sfb])]
            for sfb in range(0, 30, 2)}
        frames = [aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, bands, 150, codebook=cb))
            for _ in range(3)]
        assert all(r is not None for r in compare(frames))

    def test_dense_stereo_stream(self):
        rng = np.random.default_rng(3)
        frames = [aac_gen.make_adts_frame(
            lambda w: aac_gen.make_cpe(w, rand_bands(rng), rand_bands(rng),
                                       global_gain=140), channel_config=2)
            for _ in range(20)]
        assert all(r is not None for r in compare(frames))

    def test_window_transitions(self):
        rng = np.random.default_rng(4)
        frames = []
        for seq, shape in ((ONLY_LONG, 0), (LONG_START, 1), (EIGHT_SHORT, 1),
                           (EIGHT_SHORT, 0), (LONG_STOP, 0), (ONLY_LONG, 1)):
            short = seq == EIGHT_SHORT
            bands = rand_bands(rng, n=8, short=short)
            frames.append(aac_gen.make_adts_frame(
                lambda w, b=bands, s=seq, sh=shape: aac_gen.make_sce(
                    w, b, 150, max_sfb=8, window_shape=sh,
                    window_sequence=s)))
        assert all(r is not None for r in compare(frames))

    def test_ms_stereo(self):
        rng = np.random.default_rng(5)
        for mask, used in ((2, None), (1, [i % 2 for i in range(40)])):
            frames = [aac_gen.make_adts_frame(
                lambda w: aac_gen.make_cpe(
                    w, rand_bands(rng, n=20), rand_bands(rng, n=20), 150,
                    ms_mask=mask, ms_used=used), channel_config=2)]
            assert all(r is not None for r in compare(frames))

    def test_intensity(self):
        bands_l = {sfb: [20] * (SWB_L[sfb + 1] - SWB_L[sfb])
                   for sfb in range(8, 12)}
        for invert in (False, True):
            frames = [aac_gen.make_adts_frame(
                lambda w: aac_gen.make_cpe(
                    w, bands_l, {}, 160, max_sfb=20,
                    intensity={sfb: (4, invert) for sfb in range(8, 12)}),
                channel_config=2)]
            assert all(r is not None for r in compare(frames))

    def test_pulse(self):
        bands = {10: [3] * (SWB_L[11] - SWB_L[10])}
        frames = [aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(
                w, bands, 160,
                pulse={"start_sfb": 10, "offsets": [2, 3], "amps": [5, 7]}))]
        assert all(r is not None for r in compare(frames))

    def test_tns(self):
        rng = np.random.default_rng(6)
        bands = rand_bands(rng, maxv=8, n=20)
        for direction in (0, 1):
            tns = {"coef_res": [1],
                   "filt": [[{"length": 49, "order": 3,
                              "direction": direction, "compress": 0,
                              "coef": [1, 6, 14]}]]}
            frames = [aac_gen.make_adts_frame(
                lambda w: aac_gen.make_sce(w, bands, 150, max_sfb=20,
                                           tns=tns))]
            assert all(r is not None for r in compare(frames))

    def test_dual_mono(self):
        rng = np.random.default_rng(8)
        b0, b1 = rand_bands(rng, n=15), rand_bands(rng, n=15)
        frames = [aac_gen.make_adts_frame(
            lambda w: (aac_gen.make_sce(w, b0, 150),
                       aac_gen.make_sce(w, b1, 150)), channel_config=0)]
        res = compare(frames)
        assert res[0].elements == [0, 0]
        assert len(res[0].element_bits) == 2

    def test_32k_short_window(self):
        rng = np.random.default_rng(9)
        swb = T.SWB_OFFSETS[(128, 32000)]
        bands = {sfb: [int(v) for v in rng.integers(
            -9, 10, size=(swb[sfb + 1] - swb[sfb]) * 8)] for sfb in range(8)}
        frames = [aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, bands, 150, sr_index=5, max_sfb=8,
                                       window_sequence=EIGHT_SHORT),
            sr_index=5)]
        res = compare(frames)
        assert res[0].sample_rate == 32000

    def test_garbage_rejected_identically(self):
        rng = np.random.default_rng(10)
        good = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, rand_bands(rng, n=10), 150))
        frames = [bytes(good[:i]) + bytes([0xAA]) * (len(good) - i)
                  for i in (8, 10, 15, 20, len(good) // 2)]
        compare(frames)  # agreement on None is the assertion

    def test_truncated_rejected_identically(self):
        rng = np.random.default_rng(11)
        good = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, rand_bands(rng, n=30), 150))
        compare([good[:n] for n in (7, 9, 16, len(good) - 1)])


class TestFactoryAndState:
    def test_make_decoder_prefers_native(self):
        assert isinstance(make_decoder(), NativeAacDecoder)

    def test_reset_clears_overlap(self):
        rng = np.random.default_rng(12)
        f = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, rand_bands(rng, n=20), 155))
        nat = NativeAacDecoder()
        first = nat.decode(f).pcm
        assert nat.decode(f).pcm != first  # overlap state advanced
        nat.reset()
        assert nat.decode(f).pcm == first

    def test_stream_statefulness_matches(self):
        # 40-frame stream: overlap-add state must track the oracle
        rng = np.random.default_rng(13)
        frames = []
        for i in range(40):
            if i % 7 == 3:
                frames.append(aac_gen.make_adts_frame(
                    lambda w: aac_gen.make_sce(
                        w, rand_bands(rng, n=8, short=True), 150, max_sfb=8,
                        window_sequence=EIGHT_SHORT)))
            else:
                frames.append(aac_gen.make_adts_frame(
                    lambda w: aac_gen.make_sce(
                        w, rand_bands(rng, n=20), 150, max_sfb=20,
                        window_shape=i % 2)))
        assert all(r is not None for r in compare(frames))
