"""Test-side AAC-LC bitstream constructor: builds valid ADTS frames from
spectral values so the decoder can be validated analytically (no reference
decoder exists in this environment)."""

from __future__ import annotations

from amatsukaze_tpu.audio import aac_tables as T
from amatsukaze_tpu.audio.aac import (
    EIGHT_SHORT,
    ID_CPE,
    ID_END,
    ID_SCE,
    ONLY_LONG,
    QUAD_BOOKS,
    SIGNED_BOOKS,
    SAMPLE_RATES,
)
from amatsukaze_tpu.utils.bits import BitWriter

_ENC = {}
for cb, book in [(1, T.HCB_1), (2, T.HCB_2), (3, T.HCB_3), (4, T.HCB_4),
                 (5, T.HCB_5), (6, T.HCB_6), (7, T.HCB_7), (8, T.HCB_8),
                 (9, T.HCB_9), (10, T.HCB_10), (11, T.HCB_11)]:
    _ENC[cb] = {vals: (L, code) for L, code, vals in book}
_ENC_SF = {vals[0]: (L, code) for L, code, vals in T.HCB_SF}


def write_codeword(w: BitWriter, cb: int, vals: tuple) -> None:
    """Encode one tuple for codebook cb (with sign bits / escapes)."""
    if cb in SIGNED_BOOKS:
        L, code = _ENC[cb][tuple(vals)]
        w.write(code, L)
        return
    mags = []
    signs = []
    escapes = []
    for v in vals:
        mag = abs(v)
        if cb == 11 and mag >= 16:
            escapes.append(mag)
            mag = 16
        elif cb == 11:
            escapes.append(None)
        mags.append(mag)
        signs.append(v < 0)
    L, code = _ENC[cb][tuple(mags)]
    w.write(code, L)
    for mag, neg in zip(mags, signs):
        if mag:
            w.write(1 if neg else 0, 1)
    if cb == 11:
        for esc in escapes:
            if esc is None or esc < 16:
                continue
            n = esc.bit_length() - 1
            w.write(((1 << (n - 4)) - 1) << 1, n - 4 + 1)  # n-4 ones, then 0
            w.write(esc - (1 << n), n)


def write_sf_delta(w: BitWriter, delta: int) -> None:
    L, code = _ENC_SF[delta + 60]
    w.write(code, L)


def write_ics_info(w: BitWriter, window_sequence: int, window_shape: int,
                   max_sfb: int) -> None:
    w.write(0, 1)  # reserved
    w.write(window_sequence, 2)
    w.write(window_shape, 1)
    if window_sequence == EIGHT_SHORT:
        w.write(max_sfb, 4)
        w.write(0x7F, 7)  # scale_factor_grouping: one group of 8 windows
    else:
        w.write(max_sfb, 6)
        w.write(0, 1)  # predictor_data_present


def write_ics(w: BitWriter, band_values: dict, global_gain: int,
              sr_index: int, codebook: int, max_sfb: int,
              window_sequence: int, window_shape: int,
              include_ics_info: bool, pulse: dict | None = None,
              tns: dict | None = None,
              intensity: dict | None = None) -> None:
    """One individual_channel_stream.

    pulse: {"start_sfb", "offsets": [..], "amps": [..]} (long windows only)
    tns: {"coef_res": per-window list, "filt": per-window list of
         {"length", "order", "direction", "compress", "coef": [raw]}}
    intensity: {sfb: (is_pos, invert)} -> codebook 15 (14 when invert);
         carries no spectral data (second CPE channel only)
    """
    short = window_sequence == EIGHT_SHORT
    swb = T.SWB_OFFSETS[(128 if short else 1024, SAMPLE_RATES[sr_index])]
    nwin = 8 if short else 1  # one group of 8 short windows
    intensity = intensity or {}
    w.write(global_gain, 8)
    if include_ics_info:
        write_ics_info(w, window_sequence, window_shape, max_sfb)
    # section_data: runs of equal-codebook sections
    def cb_of(sfb):
        if sfb in band_values:
            return codebook
        if sfb in intensity:
            return 14 if intensity[sfb][1] else 15
        return 0
    sect_bits = 3 if short else 5
    esc = (1 << sect_bits) - 1
    sfb = 0
    while sfb < max_sfb:
        cb = cb_of(sfb)
        run = 1
        while sfb + run < max_sfb and cb_of(sfb + run) == cb:
            run += 1
        w.write(cb, 4)
        rem = run
        while rem >= esc:
            w.write(esc, sect_bits)
            rem -= esc
        w.write(rem, sect_bits)
        sfb += run
    # scale_factor_data: delta 0 for each coded band (sf = global_gain);
    # intensity positions are a separate delta chain starting at 0
    is_pos = 0
    for sfb in range(max_sfb):
        if sfb in band_values:
            write_sf_delta(w, 0)
        elif sfb in intensity:
            write_sf_delta(w, intensity[sfb][0] - is_pos)
            is_pos = intensity[sfb][0]
    if pulse is not None:
        w.write(1, 1)
        w.write(len(pulse["offsets"]) - 1, 2)
        w.write(pulse["start_sfb"], 6)
        for off, amp in zip(pulse["offsets"], pulse["amps"]):
            w.write(off, 5)
            w.write(amp, 4)
    else:
        w.write(0, 1)  # pulse_data_present
    if tns is not None:
        w.write(1, 1)
        n_filt_bits = 1 if short else 2
        len_bits = 4 if short else 6
        order_bits = 3 if short else 5
        for win in range(nwin):
            filts = tns["filt"][win] if win < len(tns["filt"]) else []
            w.write(len(filts), n_filt_bits)
            if filts:
                coef_res = tns["coef_res"][win]
                w.write(coef_res, 1)
                for f in filts:
                    w.write(f["length"], len_bits)
                    w.write(f["order"], order_bits)
                    if f["order"]:
                        w.write(f["direction"], 1)
                        w.write(f["compress"], 1)
                        coef_bits = coef_res + 3 - f["compress"]
                        for c in f["coef"]:
                            w.write(c, coef_bits)
    else:
        w.write(0, 1)  # tns_data_present
    w.write(0, 1)  # gain_control_data_present
    # spectral_data
    step = 4 if codebook in QUAD_BOOKS else 2
    for sfb in sorted(band_values):
        vals = band_values[sfb]
        width = (swb[sfb + 1] - swb[sfb]) * nwin
        assert len(vals) == width, f"band {sfb} needs {width} values"
        for k in range(0, width, step):
            write_codeword(w, codebook, tuple(vals[k:k + step]))


def make_sce(w: BitWriter, band_values: dict, global_gain: int = 100,
             sr_index: int = 3, codebook: int = 11, max_sfb: int = 40,
             window_shape: int = 0,
             window_sequence: int = ONLY_LONG, pulse: dict | None = None,
             tns: dict | None = None) -> None:
    """One SCE. band_values: {sfb: [coeff values]} coded with `codebook`;
    all other bands zero. For EIGHT_SHORT, one group of 8 windows and
    band width x8 values per band."""
    if window_sequence == EIGHT_SHORT and max_sfb > 14:
        max_sfb = 14
    w.write(ID_SCE, 3)
    w.write(0, 4)  # element_instance_tag
    write_ics(w, band_values, global_gain, sr_index, codebook, max_sfb,
              window_sequence, window_shape, include_ics_info=True,
              pulse=pulse, tns=tns)


def make_cpe(w: BitWriter, bands_l: dict, bands_r: dict,
             global_gain: int = 100, sr_index: int = 3, codebook: int = 11,
             max_sfb: int = 40, ms_mask: int = 0,
             ms_used: list | None = None,
             intensity: dict | None = None) -> None:
    """One CPE with common_window=1, optional M/S, and optional intensity
    bands on the right channel ({sfb: (is_pos, invert)})."""
    w.write(ID_CPE, 3)
    w.write(0, 4)
    w.write(1, 1)  # common_window
    write_ics_info(w, ONLY_LONG, 0, max_sfb)
    w.write(ms_mask, 2)
    if ms_mask == 1:
        for sfb in range(max_sfb):
            w.write(1 if (ms_used and ms_used[sfb]) else 0, 1)
    write_ics(w, bands_l, global_gain, sr_index, codebook, max_sfb,
              ONLY_LONG, 0, include_ics_info=False)
    write_ics(w, bands_r, global_gain, sr_index, codebook, max_sfb,
              ONLY_LONG, 0, include_ics_info=False, intensity=intensity)


def make_adts_frame(payload_writer_fn, sr_index: int = 3,
                    channel_config: int = 1, profile: int = 1) -> bytes:
    """Build a full ADTS frame; payload_writer_fn(BitWriter) writes the
    syntactic elements (END is appended here)."""
    w = BitWriter()
    payload_writer_fn(w)
    w.write(ID_END, 3)
    w.byte_align(fill=0)
    payload = w.getvalue()
    frame_length = 7 + len(payload)
    h = BitWriter()
    h.write(0xFFF, 12)
    h.write(1, 1)  # ID (MPEG-2)
    h.write(0, 2)  # layer
    h.write(1, 1)  # protection_absent
    h.write(profile, 2)  # AAC-LC
    h.write(sr_index, 4)
    h.write(0, 1)  # private
    h.write(channel_config, 3)
    h.write(0, 4)  # original/home/copyright id/start
    h.write(frame_length, 13)
    h.write((1 << 11) - 1, 11)
    h.write(0, 2)  # raw blocks - 1
    return h.getvalue() + payload
