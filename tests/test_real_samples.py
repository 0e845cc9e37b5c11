"""Optional real-broadcast-sample tier (the reference's TestParam.ini
fixtures, AmatsukazeUnitTest.cpp:66-86: tests SKIP when samples are
absent). Point AMATSUKAZE_TEST_TS_DIR at a directory of *.ts recordings
to exercise demux + reform + probe + (decoder-less) transcode on real
streams; without it this module is a no-op."""

import glob
import os
import stat

import pytest

SAMPLE_DIR = os.environ.get("AMATSUKAZE_TEST_TS_DIR", "")
SAMPLES = sorted(glob.glob(os.path.join(SAMPLE_DIR, "*.ts"))) \
    if SAMPLE_DIR else []

pytestmark = pytest.mark.skipif(
    not SAMPLES, reason="set AMATSUKAZE_TEST_TS_DIR to run on real samples")

FAKE_ENCODER = """#!/bin/bash
out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -o) out="$2"; shift 2;;
    *) shift;;
  esac
done
cat > /dev/null
echo fake > "$out"
"""


@pytest.mark.parametrize("src", SAMPLES, ids=[os.path.basename(s)
                                              for s in SAMPLES])
class TestRealSamples:
    def test_ts_info_probe(self, src):
        from amatsukaze_tpu.ts.info import TsInfo
        from amatsukaze_tpu.utils.context import AMTContext

        info = TsInfo(AMTContext(level="error"))
        assert info.read_file(src)
        assert info.programs

    def test_demux_reform(self, src, tmp_path):
        from amatsukaze_tpu.pipeline.splitter import AMTSplitter
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.utils.context import AMTContext

        conf = Config()
        conf.src_file_path = src
        conf.out_video_path = str(tmp_path / "out")
        conf.work_dir = str(tmp_path)
        ctx = AMTContext(level="error")
        st = Settings(ctx, conf)
        splitter = AMTSplitter(ctx, st)
        reform = splitter.split()
        reform.prepare(split_sub=st.conf.split_sub)
        del splitter
        assert reform.num_video_file >= 1
        frames = reform.get_filter_source_frames(0)
        assert len(frames) > 0

    def test_decoderless_transcode(self, src, tmp_path):
        from amatsukaze_tpu.pipeline.decoders import NullDecoderFactory
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.transcode import TranscodePipeline
        from amatsukaze_tpu.utils.context import AMTContext

        enc = tmp_path / "fake_enc"
        enc.write_text(FAKE_ENCODER)
        enc.chmod(enc.stat().st_mode | stat.S_IEXEC)
        conf = Config()
        conf.src_file_path = src
        conf.out_video_path = str(tmp_path / "out")
        conf.out_info_json_path = str(tmp_path / "result.json")
        conf.work_dir = str(tmp_path)
        conf.encoder_path = str(enc)
        ctx = AMTContext(level="error")
        pipe = TranscodePipeline(ctx, Settings(ctx, conf),
                                 decoder_factory=NullDecoderFactory())
        report = pipe.run()
        assert report["outfiles"]

    def test_qp_extraction_health(self, src, tmp_path):
        """Real MPEG2 streams validate the DCT tables: a high slice-QP
        fallback share means a table defect (mpeg2_tables notes)."""
        from amatsukaze_tpu.pipeline.splitter import AMTSplitter
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.ts.qp_extract import QpMapSource
        from amatsukaze_tpu.utils.context import AMTContext

        conf = Config()
        conf.src_file_path = src
        conf.out_video_path = str(tmp_path / "out")
        conf.work_dir = str(tmp_path)
        ctx = AMTContext(level="error")
        st = Settings(ctx, conf)
        reform = AMTSplitter(ctx, st).split()
        reform.prepare(split_sub=st.conf.split_sub)
        path = st.int_video_file_path(0)
        if not os.path.exists(path):
            pytest.skip("no intermediate video written")
        qsrc = QpMapSource.from_file(path)
        if not len(qsrc):
            pytest.skip("not an MPEG2 video stream")
        if not qsrc.full_parse:
            pytest.skip("slice-level extractor only (no native library)")
        total = qsrc.slices_ok + qsrc.slices_fallback
        assert total > 0
        # full-parse success rate: table defects would tank this
        assert qsrc.slices_ok / total > 0.95, (
            f"{qsrc.slices_fallback}/{total} slices fell back - "
            "suspect a DCT table defect")

    def test_caption_decode_health(self, src, tmp_path):
        """Real broadcast captions through the in-build ARIB decoder:
        every caption PES must decode without error, text must contain
        no raw control characters, and DRCS glyphs must resolve to the
        placeholder or a mapping (grounds TVCaptionMod2 parity on real
        streams; unmapped-DRCS bitmaps land in the tmp dir for eyeball
        checks)."""
        from amatsukaze_tpu.captions.b24 import CaptionDecoder
        from amatsukaze_tpu.pipeline.settings import Config, Settings
        from amatsukaze_tpu.pipeline.splitter import AMTSplitter
        from amatsukaze_tpu.utils.context import AMTContext

        conf = Config()
        conf.src_file_path = src
        conf.out_video_path = str(tmp_path / "out")
        conf.work_dir = str(tmp_path)
        conf.subtitles = True
        ctx = AMTContext(level="error")
        st = Settings(ctx, conf)
        dec = CaptionDecoder(ctx, drcs_out_dir=str(tmp_path / "drcs"))
        splitter = AMTSplitter(ctx, st, caption_decoder=dec)
        reform = splitter.split()
        reform.prepare(split_sub=True)
        items = reform.caption_item_list
        if not items:
            pytest.skip("no captions in this recording")
        for it in items:
            if it.line is None:
                continue
            assert not any(ord(c) < 0x20 and c != "\n" for c in it.line.text)
            assert it.line.formats and it.line.formats[0].pos == 0
            for a, b in zip(it.line.formats, it.line.formats[1:]):
                assert a.pos < b.pos <= len(it.line.text)
