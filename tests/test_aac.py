"""In-build AAC-LC decoder tests: analytically-constructed frames
(silence, spectral lines, escapes, dual-mono) since no reference decoder
exists in this environment."""

import numpy as np
import pytest

import aac_gen
from amatsukaze_tpu.audio.aac import EIGHT_SHORT as _ES
from amatsukaze_tpu.audio.aac import SAMPLE_RATES, AacLcDecoder
from amatsukaze_tpu.audio import aac_tables as T


def decode_frames(frames, decoder=None):
    dec = decoder or AacLcDecoder()
    outs = [dec.decode(f) for f in frames]
    assert all(o is not None for o in outs)
    return outs


def pcm_array(res):
    return np.frombuffer(res.pcm, "<i2").reshape(-1, res.num_channels)


class TestSilence:
    def test_all_zero_spectrum(self):
        frame = aac_gen.make_adts_frame(lambda w: aac_gen.make_sce(w, {}))
        outs = decode_frames([frame, frame])
        for res in outs:
            assert res.num_channels == 1
            assert res.sample_rate == 48000
            a = pcm_array(res)
            assert a.shape == (1024, 1)
            assert np.all(a == 0)
        assert outs[0].elements == [0]  # one SCE
        assert len(outs[0].element_bits) == 1


class TestSpectralLine:
    @pytest.mark.parametrize("coef_index", [8, 100, 301])
    def test_single_line_frequency(self, coef_index):
        # one spectral coefficient in band sfb covering coef_index
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = max(i for i in range(len(swb) - 1) if swb[i] <= coef_index)
        width = swb[sfb + 1] - swb[sfb]
        vals = [0] * width
        vals[coef_index - swb[sfb]] = 40  # escape-coded magnitude (>16)

        def payload(w):
            # gain 2^15: real streams carry large spectral values against
            # the (2/N) IMDCT normalisation
            aac_gen.make_sce(w, {sfb: vals}, global_gain=160)

        frame = aac_gen.make_adts_frame(payload)
        outs = decode_frames([frame] * 4)
        # steady state: identical frames -> pure windowed cosine; check the
        # dominant DFT bin of a middle frame. Spectral line k corresponds to
        # frequency (k + 0.5)/2048 * sr -> bin (k + 0.5)/2 in a 1024-pt DFT
        x = pcm_array(outs[2])[:, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(x))
        peak = int(np.argmax(spec[1:])) + 1
        assert abs(peak - round((coef_index + 0.5) / 2)) <= 1
        # amplitude sanity: 40^(4/3) * 2^15 * (2/2048) ~= 4380
        assert 2000 < np.max(np.abs(x)) < 9000

    def test_scale_factor_gain(self):
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 10
        width = swb[sfb + 1] - swb[sfb]
        vals = [0] * width
        vals[0] = 10

        def mk(gain):
            return aac_gen.make_adts_frame(
                lambda w: aac_gen.make_sce(w, {sfb: vals}, global_gain=gain))

        lo = decode_frames([mk(148)] * 3)
        hi = decode_frames([mk(152)] * 3)  # +4 sf steps = 2x amplitude
        a_lo = np.abs(pcm_array(lo[2])[:, 0].astype(np.float64)).max()
        a_hi = np.abs(pcm_array(hi[2])[:, 0].astype(np.float64)).max()
        assert a_hi == pytest.approx(2 * a_lo, rel=0.02)


class TestCodebooks:
    @pytest.mark.parametrize("cb", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11])
    def test_roundtrip_each_codebook(self, cb):
        """Values coded with every codebook decode to the same PCM as the
        equivalent escape-coded (book 11) frame."""
        lav = {1: 1, 2: 1, 3: 2, 4: 2, 5: 4, 6: 4, 7: 7, 8: 7, 9: 12,
               10: 12, 11: 15}[cb]
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 12
        width = swb[sfb + 1] - swb[sfb]
        rng = np.random.default_rng(cb)
        if cb in (3, 4, 7, 8, 9, 10, 11):
            vals = rng.integers(-lav, lav + 1, width).tolist()
        else:
            vals = rng.integers(-lav, lav + 1, width).tolist()

        f1 = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, {sfb: vals}, codebook=cb,
                                       global_gain=170))
        f2 = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, {sfb: vals}, codebook=11,
                                       global_gain=170))
        o1 = decode_frames([f1] * 3)
        o2 = decode_frames([f2] * 3)
        np.testing.assert_array_equal(pcm_array(o1[2]), pcm_array(o2[2]))


class TestDualMono:
    def make_dual(self, amp0, amp1):
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 8
        width = swb[sfb + 1] - swb[sfb]
        v0 = [0] * width
        v0[0] = amp0
        v1 = [0] * width
        v1[1] = amp1

        def payload(w):
            aac_gen.make_sce(w, {sfb: v0}, global_gain=160)
            aac_gen.make_sce(w, {sfb: v1}, global_gain=160)

        return aac_gen.make_adts_frame(payload, channel_config=0)

    def test_two_sce_decode(self):
        frame = self.make_dual(30, 50)
        outs = decode_frames([frame] * 3)
        assert outs[0].num_channels == 2
        assert outs[0].elements == [0, 0]
        assert len(outs[0].element_bits) == 2
        a = pcm_array(outs[2]).astype(np.float64)
        assert np.abs(a[:, 1]).max() > np.abs(a[:, 0]).max()

    def test_dual_mono_split_bit_exact(self, ctx):
        """element_bits drive the DualMonoSplitter: each mono output frame
        must decode to the corresponding channel's PCM."""
        from amatsukaze_tpu.ts.adts import DualMonoSplitter

        frame = self.make_dual(30, 50)
        outs = []

        class Sink(DualMonoSplitter):
            def __init__(self):
                super().__init__(ctx, AacLcDecoder())
                self.frames = {0: [], 1: []}

            def on_out_frame(self, index, data):
                self.frames[index].append(data)

        sink = Sink()
        for _ in range(3):
            sink.input_packet(frame)
        assert len(sink.frames[0]) == 3 and len(sink.frames[1]) == 3

        # decode the stereo original and each mono stream
        ref = decode_frames([frame] * 3)
        d0 = decode_frames(sink.frames[0], AacLcDecoder())
        d1 = decode_frames(sink.frames[1], AacLcDecoder())
        for k in range(3):
            both = pcm_array(ref[k])
            np.testing.assert_array_equal(pcm_array(d0[k])[:, 0], both[:, 0])
            np.testing.assert_array_equal(pcm_array(d1[k])[:, 0], both[:, 1])


class TestRobustness:
    def test_garbage_returns_none(self):
        dec = AacLcDecoder()
        assert dec.decode(b"\x00" * 32) is None
        assert dec.decode(b"\xff\xf1" + b"\x55" * 40) is None or True  # no crash

    def test_truncated_frame(self):
        frame = aac_gen.make_adts_frame(lambda w: aac_gen.make_sce(w, {}))
        dec = AacLcDecoder()
        assert dec.decode(frame[:9]) is None


class TestStereo:
    def test_cpe_ms_stereo(self):
        """M/S: transmitted (mid, side) -> L = m+s, R = m-s."""
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 10
        width = swb[sfb + 1] - swb[sfb]
        mid = [0] * width
        mid[0] = 30
        side = [0] * width
        side[0] = 10

        def mk(ms_mask):
            return aac_gen.make_adts_frame(
                lambda w: aac_gen.make_cpe(w, {sfb: mid}, {sfb: side},
                                           global_gain=160, ms_mask=ms_mask),
                channel_config=2)

        plain = decode_frames([mk(0)] * 3)
        ms = decode_frames([mk(2)] * 3)
        p = pcm_array(plain[2]).astype(np.float64)
        m = pcm_array(ms[2]).astype(np.float64)
        # with M/S on: L = mid+side, R = mid-side (elementwise on spectra =>
        # also on the decoded time signal, linearity)
        np.testing.assert_allclose(m[:, 0], p[:, 0] + p[:, 1], atol=1.5)
        np.testing.assert_allclose(m[:, 1], p[:, 0] - p[:, 1], atol=1.5)

    def test_cpe_ms_per_band_mask(self):
        swb = T.SWB_OFFSETS[(1024, 48000)]
        s1, s2 = 8, 12
        w1 = swb[s1 + 1] - swb[s1]
        w2 = swb[s2 + 1] - swb[s2]
        left = {s1: [20] + [0] * (w1 - 1), s2: [20] + [0] * (w2 - 1)}
        right = {s1: [5] + [0] * (w1 - 1), s2: [5] + [0] * (w2 - 1)}
        ms_used = [False] * 40
        ms_used[s2] = True  # only band s2 is M/S coded

        def mk(mask, used):
            return aac_gen.make_adts_frame(
                lambda w: aac_gen.make_cpe(w, left, right, global_gain=160,
                                           ms_mask=mask, ms_used=used),
                channel_config=2)

        plain = decode_frames([mk(0, None)] * 3)
        masked = decode_frames([mk(1, ms_used)] * 3)
        # both decode without error and differ (band s2 reconstructed M/S)
        assert not np.array_equal(pcm_array(plain[2]), pcm_array(masked[2]))


class TestWindowSequences:
    def test_short_windows_decode(self):
        swb = T.SWB_OFFSETS[(128, 48000)]
        sfb = 4
        width = (swb[sfb + 1] - swb[sfb]) * 8  # one group of 8 windows
        vals = [15] * width

        def payload(w):
            aac_gen.make_sce(w, {sfb: vals}, global_gain=160,
                             window_sequence=_ES)

        from amatsukaze_tpu.audio.aac import EIGHT_SHORT  # noqa: F401
        frame = aac_gen.make_adts_frame(payload)
        outs = decode_frames([frame] * 3)
        x = pcm_array(outs[2])[:, 0]
        assert np.abs(x).max() > 100  # produced signal, no crash

    def test_long_start_stop_transition(self):
        """ONLY_LONG -> LONG_START -> EIGHT_SHORT -> LONG_STOP -> ONLY_LONG
        with a steady tone stays continuous (no window-seam spikes)."""
        from amatsukaze_tpu.audio.aac import (
            EIGHT_SHORT, LONG_START, LONG_STOP, ONLY_LONG)

        swb_l = T.SWB_OFFSETS[(1024, 48000)]
        sfb_l = 10
        wl = swb_l[sfb_l + 1] - swb_l[sfb_l]
        band_l = {sfb_l: [25] + [0] * (wl - 1)}
        swb_s = T.SWB_OFFSETS[(128, 48000)]
        sfb_s = 4  # short band covering ~the same frequency region
        ws = (swb_s[sfb_s + 1] - swb_s[sfb_s]) * 8
        band_s = {sfb_s: [25] * ws}

        def mk(seq, bands):
            return aac_gen.make_adts_frame(
                lambda w: aac_gen.make_sce(w, bands, global_gain=160,
                                           window_sequence=seq))

        frames = [mk(ONLY_LONG, band_l), mk(LONG_START, band_l),
                  mk(EIGHT_SHORT, band_s), mk(LONG_STOP, band_l),
                  mk(ONLY_LONG, band_l)]
        outs = decode_frames(frames)
        pcm = np.concatenate([pcm_array(o)[:, 0] for o in outs]).astype(float)
        # no pathological discontinuities: max sample-to-sample jump bounded
        # relative to the signal amplitude
        amp = np.abs(pcm[1024:4096]).max()
        assert amp > 50
        jumps = np.abs(np.diff(pcm[1024:4096]))
        assert jumps.max() < amp  # a seam glitch would exceed the amplitude


class TestPulse:
    def test_pulse_equals_direct_coding(self):
        # pulse adds amp to the QUANTIZED value: coding q with pulse amp a
        # must decode identically to coding q+a directly
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 10
        width = swb[sfb + 1] - swb[sfb]
        vals = [3] * width
        k_in_band = 2
        amp = 5

        def with_pulse(w):
            aac_gen.make_sce(
                w, {sfb: vals}, global_gain=160, codebook=11,
                pulse={"start_sfb": sfb, "offsets": [k_in_band],
                       "amps": [amp]})

        direct = list(vals)
        direct[k_in_band] = vals[k_in_band] + amp

        def without(w):
            aac_gen.make_sce(w, {sfb: direct}, global_gain=160, codebook=11)

        a = decode_frames([aac_gen.make_adts_frame(with_pulse)])[0]
        b = decode_frames([aac_gen.make_adts_frame(without)])[0]
        assert a.pcm == b.pcm

    def test_negative_base_moves_away_from_zero(self):
        # pulse amps subtract from negative quantized values
        swb = T.SWB_OFFSETS[(1024, 48000)]
        sfb = 10
        width = swb[sfb + 1] - swb[sfb]
        vals = [0] * width
        vals[0] = -3

        def with_pulse(w):
            aac_gen.make_sce(
                w, {sfb: vals}, global_gain=160, codebook=11,
                pulse={"start_sfb": sfb, "offsets": [0], "amps": [4]})

        direct = list(vals)
        direct[0] = -7

        def without(w):
            aac_gen.make_sce(w, {sfb: direct}, global_gain=160, codebook=11)

        a = decode_frames([aac_gen.make_adts_frame(with_pulse)])[0]
        b = decode_frames([aac_gen.make_adts_frame(without)])[0]
        assert a.pcm == b.pcm


class TestIntensity:
    @pytest.mark.parametrize("invert", [False, True])
    def test_intensity_scales_left_channel(self, invert):
        # right channel = left * (+/-)2^(-is_pos/4); the filterbank is
        # linear, so the PCM obeys the same relation on the first frame
        swb = T.SWB_OFFSETS[(1024, 48000)]
        bands_l = {}
        for sfb in range(8, 12):
            bands_l[sfb] = [20] * (swb[sfb + 1] - swb[sfb])
        is_pos = 4  # scale 1/2

        def payload(w):
            aac_gen.make_cpe(
                w, bands_l, {}, global_gain=160, max_sfb=20,
                intensity={sfb: (is_pos, invert) for sfb in range(8, 12)})

        res = decode_frames(
            [aac_gen.make_adts_frame(payload, channel_config=2)])[0]
        a = pcm_array(res).astype(np.float64)
        scale = 2.0 ** (-is_pos / 4.0) * (-1.0 if invert else 1.0)
        assert np.abs(a[:, 0]).max() > 100
        assert np.allclose(a[:, 1], a[:, 0] * scale, atol=1.0)


class TestTns:
    def test_tns_matches_definitional_recursion(self):
        # decode a TNS frame and a TNS-free twin; the PCM difference must
        # equal the definitional IMDCT (O(N^2) matrix) of the spectrum
        # delta produced by the TNS all-pole recursion computed here
        from amatsukaze_tpu.audio.aac import imdct_matrix, _sine_window

        swb = T.SWB_OFFSETS[(1024, 48000)]
        max_sfb = 20
        rng = np.random.default_rng(7)
        bands = {}
        for sfb in range(max_sfb):
            width = swb[sfb + 1] - swb[sfb]
            bands[sfb] = [int(v) for v in rng.integers(-8, 9, size=width)]
        gg = 155
        order = 2
        coef_raw = [1, 6]  # coef_res=1, compress=0 -> 4-bit raw codes
        # TNS regions count DOWN from num_swb: length must span all 49
        # long bands at 48 kHz so the filter reaches sfb 0..max_sfb
        tns = {"coef_res": [1],
               "filt": [[{"length": 49, "order": order,
                          "direction": 0, "compress": 0,
                          "coef": coef_raw}]]}

        fr_tns = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, bands, gg, max_sfb=max_sfb,
                                       tns=tns))
        fr_plain = aac_gen.make_adts_frame(
            lambda w: aac_gen.make_sce(w, bands, gg, max_sfb=max_sfb))
        a = decode_frames([fr_tns])[0]
        b = decode_frames([fr_plain])[0]
        pa = pcm_array(a)[:, 0].astype(np.float64)
        pb = pcm_array(b)[:, 0].astype(np.float64)

        # reconstruct the spectrum and the TNS recursion from first
        # principles (ISO 14496-3 4.6.9)
        spec = np.zeros(1024)
        gain = 2.0 ** (0.25 * (gg - 100))
        for sfb, vals in bands.items():
            arr = np.asarray(vals, np.float64)
            spec[swb[sfb]:swb[sfb + 1]] = (
                np.sign(arr) * np.abs(arr) ** (4.0 / 3.0) * gain)
        coef_bits = 1 + 3
        rng_ = 1 << (coef_bits - 1)
        iqfac = (rng_ - 0.5) / (np.pi / 2.0)
        iqfac_m = (rng_ + 0.5) / (np.pi / 2.0)
        refl = []
        for c in coef_raw:
            if c >= rng_:
                c -= 1 << coef_bits
            refl.append(np.sin(c / (iqfac if c >= 0 else iqfac_m)))
        lpc = np.array([1.0])
        for m in range(1, order + 1):
            nxt = np.zeros(m + 1)
            nxt[:m] = lpc
            for i in range(1, m):
                nxt[i] += refl[m - 1] * lpc[m - i]
            nxt[m] = refl[m - 1]
            lpc = nxt
        start, end = 0, swb[max_sfb]
        filt = spec.copy()
        for i in range(start, end):
            acc = filt[i]
            for j in range(1, order + 1):
                if i - j >= start:
                    acc -= lpc[j] * filt[i - j]
            filt[i] = acc

        imdct = imdct_matrix(2048)
        win = _sine_window(2048)
        expected_delta = ((imdct @ (filt - spec)) * win)[:1024]
        assert np.abs(pa - pb).max() > 10  # the filter did something
        assert np.allclose(pa - pb, expected_delta, atol=1.5)
