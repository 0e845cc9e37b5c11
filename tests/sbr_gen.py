"""Test-side SBR bitstream constructor: appends valid SBR fill-element
payloads to AAC-LC frames from aac_gen so the HE-AAC path can be validated
analytically (no reference HE-AAC encoder exists in this environment)."""

from __future__ import annotations

from amatsukaze_tpu.audio import sbr_tables as T
from amatsukaze_tpu.utils.bits import BitWriter

_ENC = {}
for name in ("F_HUFFMAN_ENV_1_5DB", "F_HUFFMAN_ENV_3_0DB",
             "T_HUFFMAN_ENV_1_5DB", "T_HUFFMAN_ENV_3_0DB"):
    _ENC[name] = {v: (L, code) for L, code, v in getattr(T, name)}


def _write_huff(w: BitWriter, table: str, value: int) -> None:
    L, code = _ENC[table][value]
    w.write(code, L)


def sbr_payload(*, header: bool = True, amp_res: int = 1,
                start_freq: int = 5, stop_freq: int = 3, xover_band: int = 0,
                freq_scale: int = 2, alter_scale: int = 1, noise_bands: int = 2,
                env_start: int = 20, env_deltas: list[int] | None = None,
                noise_start: int = 30, num_env: int = 1,
                freq_res: int = 0, invf_mode: int = 0, n_env_bands: int = 0,
                n_noise_bands: int = 0) -> bytes:
    """Build one SCE SBR extension payload (FIXFIX grid, freq-delta coding).

    n_env_bands / n_noise_bands must match the band counts the decoder
    derives for this header (n_low/n_high and N_Q).
    """
    w = BitWriter()
    w.write(13, 4)  # EXT_SBR_DATA
    if header:
        w.write(1, 1)
        w.write(amp_res, 1)
        w.write(start_freq, 4)
        w.write(stop_freq, 4)
        w.write(xover_band, 3)
        w.write(0, 2)  # reserved
        w.write(1, 1)  # header_extra_1
        w.write(0, 1)  # header_extra_2
        w.write(freq_scale, 2)
        w.write(alter_scale, 1)
        w.write(noise_bands, 2)
    else:
        w.write(0, 1)
    # sbr_single_channel_element
    w.write(0, 1)  # bs_data_extra
    # grid FIXFIX
    w.write(0, 2)  # frame class
    w.write({1: 0, 2: 1, 4: 2}[num_env], 2)
    w.write(freq_res, 1)
    # dtdf: all freq-delta
    for _ in range(num_env):
        w.write(0, 1)
    n_q_env = 2 if num_env > 1 else 1
    for _ in range(n_q_env):
        w.write(0, 1)
    # invf per noise band
    for _ in range(n_noise_bands):
        w.write(invf_mode, 2)
    # envelope: amp_res forced to 0 when L_E==1 and FIXFIX
    eff_amp = 0 if num_env == 1 else amp_res
    start_bits = 6 if eff_amp else 7
    ftab = "F_HUFFMAN_ENV_3_0DB" if eff_amp else "F_HUFFMAN_ENV_1_5DB"
    deltas = env_deltas or [0] * max(n_env_bands - 1, 0)
    for _ in range(num_env):
        w.write(env_start, start_bits)
        for d in deltas:
            _write_huff(w, ftab, d)
    # noise: start 5 bits then freq deltas (3dB table)
    for _ in range(n_q_env):
        w.write(noise_start, 5)
        for _ in range(max(n_noise_bands - 1, 0)):
            _write_huff(w, "F_HUFFMAN_ENV_3_0DB", 0)
    w.write(0, 1)  # add_harmonic_flag
    w.write(0, 1)  # extended_data
    w.byte_align(fill=0)  # fill bits (skipped by sbr_extension_data)
    return w.getvalue()


def append_sbr_fil(w: BitWriter, payload: bytes) -> None:
    """Write a FIL element carrying an SBR payload (call between the SCE
    and the END element)."""
    w.write(6, 3)  # ID_FIL
    cnt = len(payload)
    if cnt >= 15:
        w.write(15, 4)
        w.write(cnt - 15 + 1, 8)
    else:
        w.write(cnt, 4)
    for b in payload:
        w.write(b, 8)


# ---------------------------------------------------------------------------
# Parametric stereo (HE-AAC v2) payloads
# ---------------------------------------------------------------------------

from amatsukaze_tpu.audio import ps_tables as PT  # noqa: E402

_PS_ENC = {}
for _name in ("F_HUFF_IID_DEF", "F_HUFF_ICC", "F_HUFF_IPD", "F_HUFF_OPD"):
    _PS_ENC[_name] = {v: (L, code) for L, code, v in getattr(PT, _name)}


def _ps_huff(w: BitWriter, table: str, value: int) -> None:
    L, code = _PS_ENC[table][value]
    w.write(code, L)


def write_ps_data(w: BitWriter, *, iid_index: int = 0, icc_index: int = 0,
                  iid_mode: int = 0, icc_mode: int = 0,
                  header: bool = True) -> None:
    """One ps_data() block: single FIXFIX-style envelope, freq-coded flat
    IID/ICC at the given index."""
    nr_iid = [10, 20, 34, 10, 20, 34][iid_mode]
    nr_icc = [10, 20, 34, 10, 20, 34][icc_mode]
    w.write(1 if header else 0, 1)
    if header:
        w.write(1, 1)  # enable_iid
        w.write(iid_mode, 3)
        w.write(1, 1)  # enable_icc
        w.write(icc_mode, 3)
        w.write(0, 1)  # enable_ext
    w.write(0, 1)  # frame_class FIX
    w.write(1, 2)  # num_env code -> 1 envelope
    # iid envelope: dt=0, first value = iid_index, rest deltas 0
    w.write(0, 1)
    _ps_huff(w, "F_HUFF_IID_DEF", iid_index)
    for _ in range(nr_iid - 1):
        _ps_huff(w, "F_HUFF_IID_DEF", 0)
    # icc envelope
    w.write(0, 1)
    _ps_huff(w, "F_HUFF_ICC", icc_index)
    for _ in range(nr_icc - 1):
        _ps_huff(w, "F_HUFF_ICC", 0)


def sbr_ps_payload(*, env_start: int = 25, noise_start: int = 30,
                   n_env_bands: int, n_noise_bands: int,
                   iid_index: int = 0, icc_index: int = 0,
                   iid_mode: int = 0, icc_mode: int = 0,
                   ps_header: bool = True) -> bytes:
    """SCE SBR payload with a parametric-stereo extension block."""
    pw = BitWriter()
    write_ps_data(pw, iid_index=iid_index, icc_index=icc_index,
                  iid_mode=iid_mode, icc_mode=icc_mode,
                  header=ps_header)
    pw.byte_align(fill=0)
    ps_bytes = pw.getvalue()

    w = BitWriter()
    w.write(13, 4)  # EXT_SBR_DATA
    w.write(1, 1)   # header flag
    w.write(1, 1)   # amp_res
    w.write(5, 4)   # start_freq
    w.write(3, 4)   # stop_freq
    w.write(0, 3)   # xover
    w.write(0, 2)
    w.write(1, 1)   # extra1
    w.write(0, 1)   # extra2
    w.write(2, 2)   # freq_scale
    w.write(1, 1)   # alter_scale
    w.write(2, 2)   # noise_bands
    # sbr_single_channel_element
    w.write(0, 1)   # data_extra
    w.write(0, 2)   # FIXFIX
    w.write(0, 2)   # 1 env
    w.write(0, 1)   # freq res low
    w.write(0, 1)   # df_env
    w.write(0, 1)   # df_noise
    for _ in range(n_noise_bands):
        w.write(0, 2)  # invf NONE
    w.write(env_start, 7)  # amp_res forced 0 for 1-env FIXFIX
    for _ in range(n_env_bands - 1):
        _write_huff(w, "F_HUFFMAN_ENV_1_5DB", 0)
    w.write(noise_start, 5)
    for _ in range(n_noise_bands - 1):
        _write_huff(w, "F_HUFFMAN_ENV_3_0DB", 0)
    w.write(0, 1)   # add_harmonic_flag
    w.write(1, 1)   # extended data present
    ext_bits = 2 + len(ps_bytes) * 8
    cnt = (ext_bits + 7) // 8
    if cnt >= 15:
        w.write(15, 4)
        w.write(cnt - 15, 8)
    else:
        w.write(cnt, 4)
    w.write(2, 2)   # EXTENSION_ID_PS
    for b in ps_bytes:
        w.write(b, 8)
    # bs_fill_bits: the extension region spans exactly cnt bytes — a
    # conforming decoder consumes all 8*cnt bits, so the region itself
    # must be padded (FFmpeg reads stray ids from under-filled regions)
    w.write(0, cnt * 8 - ext_bits)
    w.byte_align(fill=0)
    return w.getvalue()
