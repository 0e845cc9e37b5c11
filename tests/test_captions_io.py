"""Caption decode/format, PS writer, y4m/wave, encoder options, process pump."""

import io as std_io

import numpy as np
import pytest

import ts_gen
from amatsukaze_tpu.captions.arib import AribDecoder, decode_arib_string
from amatsukaze_tpu.captions.b24 import drcs_md5
from amatsukaze_tpu.captions.formatters import CaptionASSFormatter, CaptionSRTFormatter
from amatsukaze_tpu.captions.b24 import CaptionFormat, CaptionLine
from amatsukaze_tpu.reform.stream_reform import OutCaptionLine
from amatsukaze_tpu.io.ps_writer import PsStreamVerifier
from amatsukaze_tpu.io.y4m import Y4MFormat, Y4MReader, Y4MWriter
from amatsukaze_tpu.io.wave import WaveWriter, parse_wave_header
from amatsukaze_tpu.io.process import DataPumpThread
from amatsukaze_tpu.pipeline.encoder_options import (
    EncoderDeint,
    parse_encoder_option,
    split_options,
)
from amatsukaze_tpu.pipeline.settings import Encoder


def jis(s: str) -> bytes:
    """Encode a kanji/kana string as ARIB GL 2-byte codes (JIS X0208)."""
    e = s.encode("euc_jp")
    return bytes(b - 0x80 for b in e)


class TestAribDecode:
    def test_ascii_via_alnum(self):
        # LS1 -> G1 (alnum) then plain bytes
        data = bytes([0x0E]) + b"Hello 123"
        assert decode_arib_string(data) == "Hello 123"

    def test_kanji_default_g0(self):
        assert decode_arib_string(jis("日本語")) == "日本語"

    def test_hiragana_gr(self):
        # GR defaults to G2 = hiragana
        data = bytes([0xA1 + 1])  # row char 2 -> 'あ'
        assert decode_arib_string(data) == "あ"

    def test_mixed_with_newline(self):
        data = jis("字幕") + bytes([0x0D]) + jis("テスト")
        assert decode_arib_string(data) == "字幕\nテスト"

    def test_designation_escape(self):
        # designate G0 <- alnum via ESC 0x28 0x4A, then ASCII in GL
        data = bytes([0x1B, 0x28, 0x4A]) + b"ABC"
        assert decode_arib_string(data) == "ABC"

    def test_c1_color_codes_skipped(self):
        data = bytes([0x87]) + jis("赤")  # WHF-family colour then text
        assert decode_arib_string(data) == "赤"

    def test_gaiji(self):
        # additional symbols: row 93 cell 90 = music note
        d = AribDecoder()
        data = bytes([0x1B, 0x24, 0x3B])  # designate G0 <- additional symbols
        data += bytes([93 + 0x20, 90 + 0x20])
        assert d.decode(data) == "♪"

    def test_mosaic_a_sextants(self):
        # designate G0 <- mosaic A (final 0x32): the contiguous 2x3
        # mosaics render as Unicode sextants / half blocks (0x7F is DEL,
        # outside GL, so the all-cells pattern only occurs via 0x6A+...)
        data = bytes([0x1B, 0x28, 0x32]) + bytes([0x21, 0x35, 0x6A, 0x62])
        got = decode_arib_string(data)
        # 0x21 = TL-only sextant; 0x35 (p=21) = left half block;
        # 0x6A (p=42) = right half block; 0x62 (p=34) = U+1FB20
        assert got == "\U0001FB00▌▐\U0001FB20"

    def test_mosaic_a_separated_column_and_bcd(self):
        # 0x40-0x5F separated/line elements and mosaic sets B/C/D have
        # no exact Unicode form: render a shade cell, never drop them
        data = bytes([0x1B, 0x28, 0x32, 0x41])       # mosaic A col 4
        data += bytes([0x1B, 0x28, 0x33, 0x30])      # mosaic B
        assert decode_arib_string(data) == "▒▒"


class TestDrcsMd5:
    def test_stable(self):
        pattern = bytes([0b10101010, 0b01010101] * 8)
        h1 = drcs_md5(4, 4, 2, pattern)
        h2 = drcs_md5(4, 4, 2, pattern)
        assert h1 == h2 and len(h1) == 32

    def test_depth_binarise(self):
        # 2-bit gradation >= 2 counts as on
        pat_low = bytes([0b01010101] * 4)  # all level 1
        pat_high = bytes([0b10101010] * 4)  # all level 2
        assert drcs_md5(4, 4, 4, pat_low) != drcs_md5(4, 4, 4, pat_high)


def out_line(text, start, end, pos_y=0.0):
    line = CaptionLine(text=text, plane_w=960, plane_h=540, pos_y=pos_y,
                       formats=[CaptionFormat(pos=0)])
    return OutCaptionLine(start=start, end=end, line=line)


class TestFormatters:
    def test_ass(self, ctx):
        lines = [out_line("こんにちは", 0.0, 90000.0),
                 out_line("second", 90000.0, 180000.0)]
        text = CaptionASSFormatter(ctx).generate(lines)
        assert "[Script Info]" in text
        assert "PlayResX: 960" in text
        assert "Style: Default,Yu Gothic,46," in text
        assert "Dialogue: 0,0:00:00.00,0:00:01.00,Default" in text
        assert "こんにちは" in text

    def test_srt(self, ctx):
        lines = [out_line("line one", 0.0, 90000.0),
                 out_line("line two", 90000.0, 270000.0)]
        text = CaptionSRTFormatter(ctx).generate(lines)
        assert "1\n00:00:00,000 --> 00:00:01,000" in text
        assert "2\n00:00:01,000 --> 00:00:03,000" in text
        assert "line one" in text


class TestPsWriter:
    def test_splitter_output_verifies(self, ctx, tmp_path):
        """The intermediate i0.mpg produced by AMTSplitter must be a valid PS."""
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.splitter import AMTSplitter

        src = tmp_path / "src.ts"
        src.write_bytes(ts_gen.build_simple_ts(num_frames=30, width=96, height=64))
        conf = Config()
        conf.src_file_path = str(src)
        conf.work_dir = str(tmp_path)
        conf.no_remove_tmp = True
        st = Settings(ctx, conf)
        sp = AMTSplitter(ctx, st)
        reform = sp.split()
        data = open(st.int_video_file_path(0), "rb").read()
        assert len(data) > 0
        v = PsStreamVerifier(ctx)
        assert v.verify(data)
        assert v.n_psm >= 1
        assert v.n_video >= 29
        assert v.n_audio > 0


class TestY4M:
    def test_roundtrip(self):
        fmt = Y4MFormat(width=32, height=16, fps_num=30000, fps_den=1001,
                        interlaced=True, sar_num=4, sar_den=3)
        buf = std_io.BytesIO()
        w = Y4MWriter(buf, fmt)
        rng = np.random.default_rng(0)
        frames = [
            (rng.integers(0, 255, (16, 32), dtype=np.uint8),
             rng.integers(0, 255, (8, 16), dtype=np.uint8),
             rng.integers(0, 255, (8, 16), dtype=np.uint8))
            for _ in range(3)
        ]
        for f in frames:
            w.write_frame(*f)
        buf.seek(0)
        r = Y4MReader(buf)
        assert r.fmt.width == 32 and r.fmt.interlaced and r.fmt.tff
        got = list(r.frames())
        assert len(got) == 3
        for (y, u, v), (y2, u2, v2) in zip(frames, got):
            np.testing.assert_array_equal(y, y2)
            np.testing.assert_array_equal(u, u2)
            np.testing.assert_array_equal(v, v2)


class TestWave:
    def test_header_parse(self):
        buf = std_io.BytesIO()
        w = WaveWriter(buf, 2, 48000, data_size=1000)
        w.write(b"\x00" * 1000)
        ch, sr, bits, off, size = parse_wave_header(buf.getvalue())
        assert (ch, sr, bits, size) == (2, 48000, 16, 1000)


class TestEncoderOptions:
    def test_x264_fixed(self):
        info = parse_encoder_option(Encoder.X264, "--preset slow")
        assert info.format.name == "H264"
        assert info.deint == EncoderDeint.NONE

    def test_split_options_quotes(self):
        assert split_options('--vpp-afs "preset=24fps" -c hevc') == [
            "--vpp-afs", "preset=24fps", "-c", "hevc"]

    def test_qsv_deint(self):
        info = parse_encoder_option(Encoder.QSVENC, "--vpp-deinterlace bob")
        assert info.deint == EncoderDeint.D60P

    def test_afs_timecode(self):
        info = parse_encoder_option(
            Encoder.NVENC, "--vpp-afs 24fps=true,drop=true,timecode=true")
        assert info.deint == EncoderDeint.VFR and info.afs_timecode

    def test_afs_inconsistent_raises(self):
        with pytest.raises(ValueError):
            parse_encoder_option(Encoder.NVENC, "--vpp-afs 24fps=true,drop=false")

    def test_select_every_and_codec(self):
        info = parse_encoder_option(
            Encoder.NVENC, "--vpp-select-every 2 -c hevc")
        assert info.select_every == 2
        assert info.format.name == "H265"


class TestDataPump:
    def test_pump_order_and_stats(self):
        seen = []
        pump = DataPumpThread(seen.append, max_items=4)
        for i in range(100):
            pump.put(i)
        pump.join()
        assert seen == list(range(100))
        assert pump.consumer_wait >= 0

    def test_consumer_error_surfaces(self):
        def bad(item):
            raise ValueError("boom")

        pump = DataPumpThread(bad, max_items=2)
        with pytest.raises(RuntimeError):
            for i in range(50):
                pump.put(i)
            pump.join()


class TestDefaultMacros:
    """STD-B24 default macro semantics (table 7-17) — the caption
    profile's G3=MACRO default and macro expansion must match the
    reference decoder (AribString.hpp:179-183 bCaption split +
    PutMacroChar :840-862)."""

    def test_caption_g3_is_macro_service_g3_is_katakana(self):
        from amatsukaze_tpu.captions.arib import AribDecoder

        assert AribDecoder(caption=True).g[3].final == 0x70
        assert AribDecoder(caption=False).g[3].final == 0x31  # katakana

    def test_macro_1_redesignates_g_sets(self):
        from amatsukaze_tpu.captions.arib import (
            _KATAKANA_TABLE,
            AribDecoder,
        )

        dec = AribDecoder(caption=True)
        # LS3 -> GL=G3 (macro); 0x61 runs default macro 1: G0=JIS kanji,
        # G1=katakana, G2=hiragana, G3=macro, LS0, LS3R
        out = dec.decode(b"\x1b\x6f" + b"\x61" + b"\x0e" + b"\x21")
        assert out == _KATAKANA_TABLE[0]  # G1 is katakana now
        assert dec.g[1].final == 0x31
        assert dec.g[3].final == 0x70  # macro survives its own expansion

    def test_macro_kanji_designation(self):
        from amatsukaze_tpu.captions.arib import AribDecoder

        dec = AribDecoder(caption=True)
        out = dec.decode(b"\x1b\x6f\x61" + b"\x0f" + b"\x30\x21")
        assert out == "亜"  # JIS X0208 30 21 via the macro's G0

    def test_macro_via_gr_invocation(self):
        from amatsukaze_tpu.captions.arib import AribDecoder

        dec = AribDecoder(caption=True)
        # LS3R (ESC 7C) -> GR=G3=macro; 0xE1 (GR) executes macro 1
        out = dec.decode(b"\x1b\x7c" + b"\xe1")
        assert out == ""
        assert dec.g[1].final == 0x31

    def test_service_string_macro_char_is_katakana(self):
        from amatsukaze_tpu.captions.arib import AribDecoder

        # service/event strings: same byte decodes as katakana via the
        # service profile's G3 (no macro machinery)
        dec = AribDecoder(caption=False)
        out = dec.decode(b"\x1b\x7d" + b"\xa1")
        assert out == "ぁ" or out  # GR still G2 hiragana by default

    def test_caption_statement_with_macro_through_b24(self):
        """A caption statement that needs a default macro must decode
        through the full CaptionData path."""
        from amatsukaze_tpu.captions.arib import AribDecoder

        dec = AribDecoder(caption=True)
        text = dec.decode(b"\x1b\x6f\x6f" + b"\x0f" + b"\x25\x21")
        # macro 0x6F: G0 = JIS X0201 katakana (half width)
        assert text and "□" not in text


class TestDrcsSubstitution:
    """DRCS gaiji download -> (charset, code) -> md5 -> user mapping
    substitution (ref CaptionData.hpp:374-445 + AMTContext DRCS map)."""

    PATTERN = bytes([0xF0, 0xF0])  # 4x4, depth 2 (1 bit/px)

    def _texts(self, items):
        return [it.line.text for it in items if it.line is not None]

    def _feed(self, dec, groups, pts=1000):
        items = []
        for g in groups:
            items.extend(dec.decode(pts, ts_gen.caption_pes_payload(g)))
        return items

    def drcs_groups(self, two_byte=False):
        import ts_gen as tg

        if two_byte:
            dl = tg.caption_statement_group(
                tg.caption_drcs_du(0x40, 0x2121, pattern=self.PATTERN,
                                   two_byte=True),
                unit_parameter=0x31)
            # designate G1 <- DRCS-0 (2-byte: ESC 0x24 0x29 0x20 0x40),
            # LS1, code 0x21 0x21, LS0
            text = (b"\x1b\x24\x29\x20\x40" + b"\x0e" + b"\x21\x21"
                    + b"\x0f" + ts_gen.arib_ascii("X"))
        else:
            dl = tg.caption_statement_group(
                tg.caption_drcs_du(0x41, 0x21, pattern=self.PATTERN),
                unit_parameter=0x30)
            # designate G1 <- DRCS-1 (ESC 0x29 0x20 0x41), LS1, code, LS0
            text = (b"\x1b\x29\x20\x41" + b"\x0e" + b"\x21" + b"\x0f"
                    + ts_gen.arib_ascii("X"))
        return [dl, tg.caption_statement_group(text)]

    def md5(self):
        return drcs_md5(4, 4, 2, self.PATTERN)

    def test_mapped_drcs_substitutes(self, tmp_path):
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        ctx = AMTContext(level="error")
        ctx.drcs_map[self.md5()] = "%"
        dec = CaptionDecoder(ctx, drcs_out_dir=str(tmp_path))
        items = self._feed(dec, self.drcs_groups())
        assert self._texts(items) == ["%X"]
        assert not list(tmp_path.iterdir())  # mapped: no BMP dump

    def test_mapped_two_byte_drcs_substitutes(self, tmp_path):
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        ctx = AMTContext(level="error")
        ctx.drcs_map[self.md5()] = "&"
        dec = CaptionDecoder(ctx, drcs_out_dir=str(tmp_path))
        items = self._feed(dec, self.drcs_groups(two_byte=True))
        assert self._texts(items) == ["&X"]

    def test_unmapped_drcs_placeholder_bmp_counter(self, tmp_path):
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext, ErrorCounter

        ctx = AMTContext(level="error")
        dec = CaptionDecoder(ctx, drcs_out_dir=str(tmp_path))
        items = self._feed(dec, self.drcs_groups())
        assert self._texts(items) == ["□X"]  # placeholder glyph
        assert ctx.error_count(ErrorCounter.NO_DRCS_MAP) == 1
        bmp = tmp_path / f"{self.md5()}.bmp"
        assert bmp.exists() and bmp.read_bytes()[:2] == b"BM"

    def test_drcs_final_collision_with_standard_set(self, tmp_path):
        """DRCS-10's final (0x4A) collides with the standard alnum set:
        only a set designated WITH the 0x20 intermediate is DRCS; plain
        alnum text whose byte equals a downloaded glyph code must NOT be
        substituted (advisor finding r2)."""
        import ts_gen as tg

        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        ctx = AMTContext(level="error")
        ctx.drcs_map[self.md5()] = "%"
        dec = CaptionDecoder(ctx, drcs_out_dir=str(tmp_path))
        dl = tg.caption_statement_group(
            tg.caption_drcs_du(0x4A, 0x58, pattern=self.PATTERN),
            unit_parameter=0x30)
        # G1 <- DRCS-10 (with 0x20), glyph 0x58 -> "%", then
        # G1 <- standard alnum (no 0x20), byte 0x58 -> literal "X"
        text = (b"\x1b\x29\x20\x4a" + b"\x0e" + b"\x58"
                + b"\x1b\x29\x4a" + b"\x58" + b"\x0f")
        items = self._feed(dec, [dl, tg.caption_statement_group(text)])
        assert self._texts(items) == ["%X"]

    def test_late_mapping_applies(self, tmp_path):
        """A mapping learned after download (ctx map updated mid-stream,
        the server DRCS workflow) applies to later statements."""
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        ctx = AMTContext(level="error")
        dec = CaptionDecoder(ctx, drcs_out_dir=str(tmp_path))
        dl, text = self.drcs_groups()
        self._feed(dec, [dl])
        ctx.drcs_map[self.md5()] = "@"
        items = self._feed(dec, [text])
        assert self._texts(items) == ["@X"]


class TestCaptionFormats:
    """Per-span colour/size capture (ref CaptionData.hpp:37-96 formats;
    rendered by CaptionASSFormatter as inline override tags)."""

    def _decode(self, du):
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        dec = CaptionDecoder(AMTContext(level="error"))
        group = ts_gen.caption_statement_group(du)
        items = dec.decode(1000, ts_gen.caption_pes_payload(group))
        lines = [it.line for it in items if it.line is not None]
        assert len(lines) == 1
        return lines[0]

    def test_c1_color_split(self):
        # "AB" white (default), then RDF (0x81) -> "CD" red
        du = ts_gen.arib_ascii("AB") + b"\x81" + b"\x43\x44"
        line = self._decode(du)
        assert line.text == "ABCD"
        assert [f.pos for f in line.formats] == [0, 2]
        assert line.formats[0].text_color == (255, 255, 255, 255)
        assert line.formats[1].text_color == (255, 0, 0, 255)

    def test_size_modes(self):
        # MSZ half-width digits then NSZ normal
        du = b"\x89" + ts_gen.arib_ascii("12") + b"\x8a" + b"\x33"
        line = self._decode(du)
        assert line.text == "123"
        assert [(f.pos, f.size_mode) for f in line.formats] == [(0, 1), (2, 2)]
        assert line.formats[0].char_w == 18.0
        assert line.formats[0].char_h == 36.0

    def test_col_background(self):
        # COL background blue (0x90 0x54) from the start
        du = b"\x90\x54" + ts_gen.arib_ascii("X")
        line = self._decode(du)
        assert len(line.formats) == 1
        assert line.formats[0].back_color == (0, 0, 255, 255)

    def test_leading_newline_strip_shifts_positions(self):
        du = b"\x0d" + ts_gen.arib_ascii("A") + b"\x82" + b"\x42"
        line = self._decode(du)
        assert line.text == "AB"
        assert [f.pos for f in line.formats] == [0, 1]
        assert line.formats[1].text_color == (0, 255, 0, 255)

    def test_ass_renders_inline_color(self):
        from amatsukaze_tpu.captions.formatters import CaptionASSFormatter
        from amatsukaze_tpu.utils.context import AMTContext

        line = self._decode(ts_gen.arib_ascii("AB") + b"\x81" + b"\x43")
        out = OutCaptionLine(start=0.0, end=1.0, line=line)
        ass = CaptionASSFormatter(AMTContext(level="error")).generate([out])
        assert "ABC" not in ass.replace("{", "|")  # split by override tag
        assert "\\c&H" in ass.split("AB", 1)[1]  # colour change before C

    def test_csi_layout_positions(self):
        # SDP(100,200) SSM(24,24) SVS(12) then APS row 2 col 3
        csi = (b"\x9b" + b"100;200 \x5f"          # SDP
               + b"\x9b" + b"24;24 \x57"          # SSM
               + b"\x9b" + b"12 \x59"             # SVS
               + b"\x9b" + b"4 \x58"              # SHS
               + b"\x1c" + bytes([0x40 + 2, 0x40 + 3]))  # APS row2 col3
        line = self._decode(csi + ts_gen.arib_ascii("POS"))
        assert line.formats[0].char_w == 24.0
        assert line.pos_x == 100.0 + 3 * (24.0 + 4.0)
        assert line.pos_y == 200.0 + 3 * (24.0 + 12.0)

    def test_csi_swf_sets_plane(self):
        line = self._decode(b"\x9b" + b"5 \x53" + ts_gen.arib_ascii("HD"))
        assert (line.plane_w, line.plane_h) == (1920, 1080)

    def test_default_profile_a_layout(self):
        # bare APS on the default 960x540 layout: origin (170,30),
        # 36x36 cells with 4/24 spacing
        line = self._decode(b"\x1c" + bytes([0x40 + 1, 0x40])
                            + ts_gen.arib_ascii("Z"))
        assert line.pos_x == 170.0
        assert line.pos_y == 30.0 + 2 * 60.0

    def test_swf_scoped_to_statement(self):
        """CSI SWF affects only the statement that issued it; the next
        statement resets to the management-data plane (advisor r2)."""
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        dec = CaptionDecoder(AMTContext(level="error"))
        g1 = ts_gen.caption_statement_group(
            b"\x9b" + b"5 \x53" + ts_gen.arib_ascii("HD"))
        g2 = ts_gen.caption_statement_group(ts_gen.arib_ascii("SD"))
        l1 = [it.line for it in
              dec.decode(1000, ts_gen.caption_pes_payload(g1)) if it.line][0]
        l2 = [it.line for it in
              dec.decode(2000, ts_gen.caption_pes_payload(g2)) if it.line][0]
        assert (l1.plane_w, l1.plane_h) == (1920, 1080)
        assert (l2.plane_w, l2.plane_h) == (960, 540)

    def test_swf_scales_default_layout(self):
        # SWF 1920x1080 doubles the profile-A defaults: origin (340,60),
        # 72x72 cells with 8/48 spacing
        line = self._decode(b"\x9b" + b"5 \x53"
                            + b"\x1c" + bytes([0x40 + 1, 0x40 + 2])
                            + ts_gen.arib_ascii("Z"))
        assert line.formats[0].char_w == 72.0
        assert line.pos_x == 340.0 + 2 * (72.0 + 8.0)
        assert line.pos_y == 60.0 + 2 * (72.0 + 48.0)

    def test_aps_grid_unscaled_by_size_mode(self):
        # MSZ halves the glyph, not the pen grid: APS after MSZ still
        # positions on the full 36+4 cell pitch (advisor r2)
        line = self._decode(b"\x89"
                            + b"\x1c" + bytes([0x40, 0x40 + 2])
                            + ts_gen.arib_ascii("12"))
        assert line.formats[0].char_w == 18.0  # glyph is half width
        assert line.pos_x == 170.0 + 2 * (36.0 + 4.0)

    def test_time_control_0x28_params_not_text(self):
        # TIME 0x9D 0x28 P... F: parameter bytes must not leak into text
        line = self._decode(b"\x9d\x28\x31\x32\x40" + ts_gen.arib_ascii("OK"))
        assert line.text == "OK"

    def test_time_control_sets_wait(self):
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        dec = CaptionDecoder(AMTContext(level="error"))
        # TIME 0x9D 0x20 P with P=0x4F -> 15 * 100 ms
        du = b"\x9d\x20\x4f" + ts_gen.arib_ascii("WAIT")
        group = ts_gen.caption_statement_group(du)
        items = dec.decode(1000, ts_gen.caption_pes_payload(group))
        assert items[-1].wait_time == 1500

    def test_underline_and_bold_styles(self):
        from amatsukaze_tpu.captions.formatters import (
            STYLE_BOLD,
            STYLE_UNDERLINE,
        )

        # STL "U" SPL, then CSI MDF bold "B"
        du = (b"\x9a" + ts_gen.arib_ascii("U") + b"\x99"
              + b"\x9b" + b"1 \x64" + b"\x42")
        line = self._decode(du)
        assert line.text == "UB"
        styles = [(f.pos, f.style) for f in line.formats]
        assert styles == [(0, STYLE_UNDERLINE), (1, STYLE_BOLD)]


class TestRubyLayout:
    """Ruby/furigana (SSZ small-size spans) against the CSI/APS layout:
    the ASS output positions the ruby line on its own APS row with
    half-size scale overrides; SRT drops small-size fragments entirely
    (ref CaptionFormatter.hpp:267-270)."""

    def _lines(self, du):
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.utils.context import AMTContext

        dec = CaptionDecoder(AMTContext(level="error"))
        group = ts_gen.caption_statement_group(du)
        items = dec.decode(1000, ts_gen.caption_pes_payload(group))
        return [it.line for it in items if it.line is not None]

    def _ruby_du(self):
        # ruby "rb" in SSZ on row 0 col 2, base "KJ" in NSZ on row 1
        # col 2 (the broadcaster convention: ruby occupies the row above
        # its base text, half-size glyphs on the same column origin)
        return (b"\x1c" + bytes([0x40, 0x40 + 2]) + b"\x88"
                + ts_gen.arib_ascii("rb")
                + b"\x1c" + bytes([0x40 + 1, 0x40 + 2]) + b"\x8a"
                + ts_gen.arib_ascii("KJ"))

    def test_ruby_row_metrics(self):
        ruby, base = self._lines(self._ruby_du())
        # default profile-A layout: origin (170,30), 36px cells, 4/24
        # spacing; APS positions on the unscaled grid, SSZ halves only
        # the glyph metrics
        assert ruby.pos_x == base.pos_x == 170.0 + 2 * 40.0
        assert ruby.pos_y == 30.0 + 1 * 60.0
        assert base.pos_y == 30.0 + 2 * 60.0
        assert ruby.formats[0].char_w == 18.0
        assert ruby.formats[0].char_h == 18.0
        assert base.formats[0].char_w == 36.0

    def test_ass_positions_and_scales_ruby(self):
        from amatsukaze_tpu.captions.formatters import CaptionASSFormatter
        from amatsukaze_tpu.reform.stream_reform import OutCaptionLine
        from amatsukaze_tpu.utils.context import AMTContext

        ruby, base = self._lines(self._ruby_du())
        outs = [OutCaptionLine(start=0.0, end=90000.0, line=ruby),
                OutCaptionLine(start=0.0, end=90000.0, line=base)]
        ass = CaptionASSFormatter(AMTContext(level="error")).generate(outs)
        ruby_ev, base_ev = [ln for ln in ass.splitlines()
                            if ln.startswith("Dialogue:")]
        # ruby: own row above the base, half-size scale overrides
        assert "\\pos(250,90)" in ruby_ev and "rb" in ruby_ev
        assert "\\fscx50" in ruby_ev and "\\fscy50" in ruby_ev
        assert "\\pos(250,150)" in base_ev and "KJ" in base_ev
        assert "\\fscx50" not in base_ev

    def test_srt_skips_ruby_fragments(self):
        from amatsukaze_tpu.captions.formatters import CaptionSRTFormatter
        from amatsukaze_tpu.reform.stream_reform import OutCaptionLine
        from amatsukaze_tpu.utils.context import AMTContext

        ruby, base = self._lines(self._ruby_du())
        outs = [OutCaptionLine(start=0.0, end=90000.0, line=ruby),
                OutCaptionLine(start=0.0, end=90000.0, line=base)]
        srt = CaptionSRTFormatter(AMTContext(level="error")).generate(outs)
        assert "KJ" in srt
        assert "rb" not in srt  # small-size fragments are not emitted
