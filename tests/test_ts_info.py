"""TsInfo mid-file prober + slim filter tests (ref TsInfo.hpp)."""

import numpy as np
import pytest

import ts_gen
from amatsukaze_tpu.ts.info import TsInfo, slim_ts


@pytest.fixture(scope="module")
def si_ts(tmp_path_factory):
    data = ts_gen.build_simple_ts(num_frames=90, si=True,
                                  service_name="TEST TV",
                                  event_name="Test Program")
    p = tmp_path_factory.mktemp("tsinfo") / "src.ts"
    p.write_bytes(data)
    return str(p)


class TestTsInfo:
    def test_programs_and_format(self, ctx, si_ts):
        info = TsInfo(ctx)
        assert info.read_file(si_ts)
        assert len(info.programs) == 1
        prog = info.programs[0]
        assert prog.service_id == ts_gen.SERVICE_ID
        assert prog.has_video
        assert prog.video_pid == ts_gen.VIDEO_PID
        assert prog.format_ok
        assert prog.video_format.width == 1440
        assert prog.video_format.height == 1080

    def test_service_and_event(self, ctx, si_ts):
        info = TsInfo(ctx)
        info.read_file(si_ts)
        assert info.service_names[ts_gen.SERVICE_ID] == "TEST TV"
        ev = info.events[ts_gen.SERVICE_ID]
        assert ev.name == "Test Program"
        assert ev.genres == [(0x7, 0x0)]  # anime
        assert info.time is not None

    def test_get_program(self, ctx, si_ts):
        info = TsInfo(ctx)
        info.read_file(si_ts)
        assert info.get_program(ts_gen.SERVICE_ID) is not None
        assert info.get_program(9999) is None


class TestSlimFilter:
    def test_drops_leading_non_video(self, ctx, tmp_path, si_ts):
        # prepend non-video packets (null pid)
        raw = open(si_ts, "rb").read()
        null_pkt = bytearray(188)
        null_pkt[0] = 0x47
        null_pkt[1] = 0x1F
        null_pkt[2] = 0xFF
        null_pkt[3] = 0x10
        src = tmp_path / "padded.ts"
        src.write_bytes(bytes(null_pkt) * 50 + raw)
        dst = tmp_path / "slim.ts"
        written = slim_ts(str(src), str(dst))
        out = dst.read_bytes()
        assert written == len(out)
        # first packet is a video packet
        pid = ((out[1] & 0x1F) << 8) | out[2]
        assert pid == ts_gen.VIDEO_PID
        assert len(out) < len(raw) + 50 * 188
