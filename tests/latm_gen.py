"""LOAS/LATM test-stream writer: re-frame ADTS AAC as AudioSyncStream
(ISO/IEC 14496-3 1.7.3), the ARIB STD-B32 4K broadcast audio framing.
Validity is proven against libavcodec's aac_latm decoder in
tests/test_latm.py."""

from __future__ import annotations

from amatsukaze_tpu.utils.bits import BitWriter


def split_adts(es: bytes) -> list[tuple[dict, bytes]]:
    """-> [(header fields, raw payload)] per ADTS frame."""
    out = []
    i = 0
    n = len(es)
    while i + 7 <= n:
        if not (es[i] == 0xFF and (es[i + 1] & 0xF0) == 0xF0):
            i += 1
            continue
        protection_absent = es[i + 1] & 1
        profile = (es[i + 2] >> 6) & 3
        sfi = (es[i + 2] >> 2) & 0xF
        chan = ((es[i + 2] & 1) << 2) | ((es[i + 3] >> 6) & 3)
        length = ((es[i + 3] & 3) << 11) | (es[i + 4] << 3) | (es[i + 5] >> 5)
        hdr = 7 if protection_absent else 9
        if i + length > n:
            break
        out.append(({"profile": profile, "sfi": sfi, "channels": chan},
                    es[i + hdr:i + length]))
        i += length
    return out


def write_smc(w: BitWriter, hdr: dict, num_sub_frames: int = 0) -> None:
    """StreamMuxConfig, single program/layer, AAC-LC ASC."""
    w.write(0, 1)  # audioMuxVersion
    w.write(1, 1)  # allStreamsSameTimeFraming
    w.write(num_sub_frames, 6)
    w.write(0, 4)  # numProgram
    w.write(0, 3)  # numLayer
    # AudioSpecificConfig: AOT = profile+1, GASpecificConfig
    w.write(hdr["profile"] + 1, 5)
    w.write(hdr["sfi"], 4)
    w.write(hdr["channels"], 4)
    w.write(0, 1)  # frameLengthFlag (1024)
    w.write(0, 1)  # dependsOnCoreCoder
    w.write(0, 1)  # extensionFlag
    w.write(0, 3)  # frameLengthType 0
    w.write(0xFF, 8)  # latmBufferFullness
    w.write(0, 1)  # otherDataPresent
    w.write(0, 1)  # crcCheckPresent


def loas_from_adts(es: bytes, smc_interval: int = 8,
                   frames_per_mux: int = 1) -> bytes:
    """ADTS elementary stream -> LOAS AudioSyncStream bytes.

    StreamMuxConfig is carried in-band every `smc_interval` mux elements
    (broadcast repeats it for random access); `frames_per_mux` > 1
    exercises numSubFrames."""
    frames = split_adts(es)
    out = bytearray()
    k = 0
    i = 0
    while i < len(frames):
        group = frames[i:i + frames_per_mux]
        i += frames_per_mux
        w = BitWriter()
        if k % smc_interval == 0:
            w.write(0, 1)  # useSameStreamMux = 0 -> SMC inline
            write_smc(w, group[0][0], num_sub_frames=len(group) - 1)
        else:
            w.write(1, 1)
        # AudioMuxElement: PayloadLengthInfo + PayloadMux interleave
        # per subframe (1.7.3.1)
        for _, payload in group:
            ln = len(payload)
            while ln >= 255:
                w.write(255, 8)
                ln -= 255
            w.write(ln, 8)
            for b in payload:
                w.write(b, 8)
        w.byte_align()
        mux = w.getvalue()
        out += bytes([0x56, 0xE0 | ((len(mux) >> 8) & 0x1F),
                      len(mux) & 0xFF]) + mux
        k += 1
    return bytes(out)
