"""Explicit-scaling-list SPS splicer for HEVC tests.

x265 only emits scaling_list_enabled with the data-present flag OFF
(default matrices), and this build's custom scaling-list file parser
crashes -- so the explicit-coefficient syntax path (7.3.4) is exercised
by bit-splicing semantically-default matrices through every encoding
form (use-default, pred-copy incl. the sizeId-3 stride, explicit
coefficients with DC) into a real default-list stream. libavcodec
arbitrates: the patched stream must decode identically to the original.
"""

import sys, numpy as np
from amatsukaze_tpu.utils.bits import BitReader, BitWriter
from amatsukaze_tpu.video import h265_ref as HR
from amatsukaze_tpu.video import h265_tables as T
from test_h265_decode import _encode, _ff_decode, _ref_decode, _smooth_frames, _moving_frames
import pathlib, tempfile

def tee_ue(r, w):
    v = r.ue()
    # re-emit ue(v)
    n = v + 1
    nbits = n.bit_length()
    w.write(0, nbits - 1)
    w.write(n, nbits)
    return v

def tee_bits(r, w, n):
    v = r.read(n)
    w.write(v, n)
    return v

def write_ue(w, v):
    n = v + 1
    nbits = n.bit_length()
    w.write(0, nbits - 1)
    w.write(n, nbits)

def write_se(w, v):
    k = 2 * v - 1 if v > 0 else -2 * v
    write_ue(w, k)

def diag_coefs(size_id, mid):
    if size_id == 0:
        return [16] * 16
    intra = (mid < 1) if size_id == 3 else (mid < 3)
    tab = T.DEFAULT_SCALING_INTRA8 if intra else T.DEFAULT_SCALING_INTER8
    return [tab[y * 8 + x] for x, y in T.SCAN[0][3]]

def write_scaling_list_data(w):
    """Semantically-default matrices through every syntax path: size 0
    all use-default (pred delta 0); sizes 1-3 explicit for mid 0/1 (and
    3/4), pred-copy for mid 2/5; DCs explicit = 16."""
    for size_id in range(4):
        n_mat = 2 if size_id == 3 else 6
        for mid in range(n_mat):
            if size_id == 0:
                w.write(0, 1)        # pred_mode 0
                write_ue(w, 0)       # delta 0 -> default (flat 16)
                continue
            copy = (size_id < 3 and mid in (2, 5)) or \
                   (size_id == 3 and mid == 1)
            if copy:
                w.write(0, 1)
                write_ue(w, 1)       # copy mid-1 (Cr = Cb defaults)
                continue
            w.write(1, 1)            # explicit
            prev = 8
            if size_id > 1:
                write_se(w, 16 - 8)  # dc = 16
                prev = 16            # delta chain starts at the DC
            coefs = diag_coefs(size_id, mid)
            for cv in coefs:
                d = cv - prev
                if d < -128: d += 256
                if d > 127: d -= 256
                write_se(w, d)
                prev = cv

def patch_sps(nal: bytes) -> bytes:
    rbsp, _ = HR.nal_to_rbsp(nal)
    r = BitReader(rbsp, 16)
    w = BitWriter()
    w.write(int.from_bytes(rbsp[:2], "big"), 16)  # NAL header
    tee_bits(r, w, 4)   # vps id
    max_sub = tee_bits(r, w, 3)
    tee_bits(r, w, 1)
    # PTL: fixed prefix
    tee_bits(r, w, 32); tee_bits(r, w, 32); tee_bits(r, w, 24); tee_bits(r, w, 8)
    assert max_sub == 0
    tee_ue(r, w)  # sps id
    cf = tee_ue(r, w)
    assert cf == 1
    tee_ue(r, w); tee_ue(r, w)  # w, h
    if tee_bits(r, w, 1):
        for _ in range(4): tee_ue(r, w)
    tee_ue(r, w); tee_ue(r, w)  # bit depths
    tee_ue(r, w)  # log2 max poc
    sub_ord = tee_bits(r, w, 1)
    for _ in range((max_sub + 1) if sub_ord else 1):
        tee_ue(r, w); tee_ue(r, w); tee_ue(r, w)
    for _ in range(6): tee_ue(r, w)  # cb/tb sizes, trafo depths
    sle = tee_bits(r, w, 1)
    assert sle == 1, "need scaling_list_enabled stream"
    present = r.read(1)
    assert present == 0, "expected default lists"
    w.write(1, 1)  # sps_scaling_list_data_present = 1
    write_scaling_list_data(w)
    # verbatim tail copy
    rest = r.bits_left()
    while rest >= 32:
        w.write(r.read(32), 32); rest -= 32
    if rest:
        w.write(r.read(rest), rest)
    w.byte_align()
    out = w.getvalue()
    # emulation prevention
    eb = bytearray()
    zeros = 0
    for b in out:
        if zeros >= 2 and b <= 3:
            eb.append(3); zeros = 0
        eb.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(eb)

def patch_stream(es: bytes) -> bytes:
    out = bytearray()
    import re
    starts = [m.start() for m in re.finditer(b"\x00\x00\x01", es)] + [len(es)]
    out += es[:starts[0]]
    for a, b in zip(starts[:-1], starts[1:]):
        nal = es[a+3:b]
        t = (nal[0] >> 1) & 0x3F
        if t == 33:
            stripped = nal.rstrip(b"\x00")
            nal = patch_sps(stripped)
        out += b"\x00\x00\x01" + nal
    return bytes(out)

