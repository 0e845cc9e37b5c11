"""NicoJK18 client tests against a local fixture server (model:
NicoJK18Client/Program.cs wire protocol + NicoJK.hpp:131-154 exit-100
integration; zero-egress environment, so the server is in-process)."""

import http.server
import io
import struct
import threading
import zlib

import pytest

from amatsukaze_tpu.captions.nicojk import NicoJK, parse_ass, parse_ch_sid
from amatsukaze_tpu.captions.nicojk18 import (
    Chat,
    NoThreadError,
    ParamError,
    chats_to_ass,
    fetch_comments,
    make_fetcher,
    nicojk_format,
    ordered_chats,
    parse_chats,
    parse_time,
    read_data,
    run_client,
    wrap_xml,
)

BASE_DATE = 1500000000  # slot 5000000


def chat_xml(date, thread=1234, no=1, text="hello"):
    return (f'<chat thread="{thread}" no="{no}" vpos="{(date % 300) * 100}"'
            f' date="{date}" user_id="u1">{text}</chat>')


def encode_slots(slot_texts):
    """Length-prefixed zlib blobs, one per slot (the wire format)."""
    out = b""
    for text in slot_texts:
        blob = zlib.compress(text.encode("utf-8"))
        out += struct.pack("<i", len(blob)) + blob
    return out


class FixtureHandler(http.server.BaseHTTPRequestHandler):
    # class-level config set by the fixture
    comments_by_slot = {}
    no_thread_jk = set()
    fail_times = 0

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        if u.path != "/api/v1/getcomment":
            self.send_error(404)
            return
        q = parse_qs(u.query)
        jknum = q.get("jknum", [""])[0]
        if not jknum.startswith("jk"):
            self.send_error(400)
            return
        if jknum in self.no_thread_jk:
            self.send_error(406)
            return
        if FixtureHandler.fail_times > 0:
            FixtureHandler.fail_times -= 1
            self.send_error(500)
            return
        slot = int(q["slot"][0])
        num = int(q["num"][0])
        texts = ["\n".join(self.comments_by_slot.get(slot + k, []))
                 for k in range(num)]
        body = encode_slots(texts)
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def server():
    FixtureHandler.comments_by_slot = {}
    FixtureHandler.no_thread_jk = set()
    FixtureHandler.fail_times = 0
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), FixtureHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def populate(dates):
    for d in dates:
        FixtureHandler.comments_by_slot.setdefault(d // 300, []).append(
            chat_xml(d, no=len(FixtureHandler.comments_by_slot.get(
                d // 300, [])) + 1, text=f"c{d}"))


class TestWireFormat:
    def test_read_data_roundtrip(self):
        texts = ["<chat/>", "line1\nline2", ""]
        stream = io.BytesIO(encode_slots(texts))
        assert read_data(stream, 3) == texts

    def test_read_data_truncated(self):
        with pytest.raises(IOError):
            read_data(io.BytesIO(b"\x04\x00"), 1)

    def test_parse_time(self):
        assert parse_time("1500000000") == 1500000000
        # local-time round trip
        import time

        t = parse_time("20200102030405")
        assert time.localtime(t)[:6] == (2020, 1, 2, 3, 4, 5)


class TestFetch:
    def test_fetch_and_order(self, server):
        populate([BASE_DATE + 10, BASE_DATE + 700, BASE_DATE + 300])
        recv = fetch_comments("jk1", BASE_DATE, BASE_DATE + 900,
                              base_url=server, sleep=lambda s: None)
        chats = ordered_chats(parse_chats(recv), BASE_DATE, BASE_DATE + 900)
        assert [c.date for c in chats] == [
            BASE_DATE + 10, BASE_DATE + 300, BASE_DATE + 700]

    def test_range_filter(self, server):
        populate([BASE_DATE + 10, BASE_DATE + 250])
        recv = fetch_comments("jk1", BASE_DATE, BASE_DATE + 100,
                              base_url=server, sleep=lambda s: None)
        chats = ordered_chats(parse_chats(recv), BASE_DATE, BASE_DATE + 100)
        assert [c.date for c in chats] == [BASE_DATE + 10]

    def test_no_thread_raises(self, server):
        FixtureHandler.no_thread_jk = {"jk9"}
        with pytest.raises(NoThreadError):
            fetch_comments("jk9", BASE_DATE, BASE_DATE + 100,
                           base_url=server, sleep=lambda s: None)

    def test_retry_with_backoff(self, server):
        populate([BASE_DATE + 10])
        FixtureHandler.fail_times = 2
        waits = []
        recv = fetch_comments("jk1", BASE_DATE, BASE_DATE + 100,
                              base_url=server, sleep=waits.append)
        assert parse_chats(recv)
        assert waits == [2, 8]  # retry^2 * 2 seconds

    def test_retry_exhausted(self, server):
        FixtureHandler.fail_times = 99
        with pytest.raises(IOError):
            fetch_comments("jk1", BASE_DATE, BASE_DATE + 100,
                           base_url=server, retry=3, sleep=lambda s: None)

    def test_multi_batch_slots(self, server):
        # 10 slots > MAX_SLOT_REQ forces two requests
        dates = [BASE_DATE + i * 300 + 5 for i in range(10)]
        populate(dates)
        recv = fetch_comments("jk1", BASE_DATE, BASE_DATE + 3000,
                              base_url=server, sleep=lambda s: None)
        chats = ordered_chats(parse_chats(recv), BASE_DATE, BASE_DATE + 3000)
        assert len(chats) == 10


class TestClientCli:
    def test_exit_codes_and_xml_output(self, server, tmp_path):
        populate([BASE_DATE + 10, BASE_DATE + 20])
        out = io.StringIO()
        dst = tmp_path / "out.xml"
        rc = run_client(["jk1", str(BASE_DATE), str(BASE_DATE + 100),
                         "-x", "-f", str(dst)],
                        base_url=server, sleep=lambda s: None, out=out)
        assert rc == 0
        text = dst.read_text()
        assert text.startswith("<?xml")
        from xml.etree import ElementTree

        doc = ElementTree.fromstring(text)
        assert len(list(doc)) == 2

    def test_exit_100_no_thread(self, server):
        FixtureHandler.no_thread_jk = {"jk5"}
        rc = run_client(["jk5", str(BASE_DATE), str(BASE_DATE + 100)],
                        base_url=server, sleep=lambda s: None,
                        out=io.StringIO())
        assert rc == 100  # NicoJK.hpp:147 treats this as "no channel"

    def test_bad_args(self):
        assert run_client([], out=io.StringIO()) == 1
        assert run_client(["jk1", "20", "10"], out=io.StringIO()) == 1
        # > 24h range rejected
        assert run_client(["jk1", "0", str(3600 * 25)],
                          out=io.StringIO()) == 1

    def test_nicojk_line_format(self):
        items = ["<chat>a\r\nb</chat>"]
        assert nicojk_format(items) == "<chat>a&#13;&#10;b</chat>\n"
        assert "<packet>" in wrap_xml(items)


class TestConvAss:
    def test_ass_parses_downstream(self):
        chats = [Chat(BASE_DATE + 5, 1, 1, "first", ""),
                 Chat(BASE_DATE + 9, 1, 2, "second", "")]
        ass = chats_to_ass(chats, BASE_DATE)
        headers, dialogues = parse_ass(ass)
        assert len(dialogues) == 2
        # first comment at +5 s
        from amatsukaze_tpu.reform.stream_reform import MPEG_CLOCK_HZ

        assert abs(dialogues[0].start / MPEG_CLOCK_HZ - 5.0) < 0.02
        assert "first" in dialogues[0].line

    def test_ass_time_never_emits_60_seconds(self):
        from amatsukaze_tpu.captions.nicojk18 import _ass_time

        assert _ass_time(59.999) == "0:01:00.00"
        assert _ass_time(3599.996) == "1:00:00.00"
        assert _ass_time(61.5) == "0:01:01.50"
        assert _ass_time(0.004) == "0:00:00.00"

    def test_pre_start_comments_dropped(self):
        chats = [Chat(BASE_DATE - 5, 1, 1, "early", "")]
        ass = chats_to_ass(chats, BASE_DATE)
        _, dialogues = parse_ass(ass)
        assert dialogues == []


class TestFetcherIntegration:
    def _ch_sid(self, tmp_path):
        p = tmp_path / "ch_sid.txt"
        p.write_text("jk1\tNHK\t1024\t0\t総合\njk9\tETV\t1032\t0\tEテレ\n")
        return str(p)

    def test_fetcher_returns_ass(self, server, tmp_path):
        populate([BASE_DATE + 5])
        f = make_fetcher(self._ch_sid(tmp_path), base_url=server,
                         sleep=lambda s: None)
        ass = f(1024, BASE_DATE, 600)
        assert ass is not None
        _, dialogues = parse_ass(ass)
        assert len(dialogues) == 1

    def test_unknown_service_returns_none(self, server, tmp_path):
        f = make_fetcher(self._ch_sid(tmp_path), base_url=server)
        assert f(9999, BASE_DATE, 600) is None

    def test_no_thread_returns_none(self, server, tmp_path):
        FixtureHandler.no_thread_jk = {"jk9"}
        f = make_fetcher(self._ch_sid(tmp_path), base_url=server,
                         sleep=lambda s: None)
        assert f(1032, BASE_DATE, 600) is None

    def test_plugs_into_nicojk_orchestrator(self, server, tmp_path):
        from amatsukaze_tpu.utils.context import AMTContext

        populate([BASE_DATE + 5])
        ch_sid = self._ch_sid(tmp_path)
        with open(ch_sid) as fh:
            table = parse_ch_sid(fh.read())
        nico = NicoJK(AMTContext(level="error"), ch_sid_map=table,
                      fetchers=[make_fetcher(ch_sid, base_url=server,
                                             sleep=lambda s: None)],
                      mask=0b0011)
        assert nico.make_ass(1024, BASE_DATE, 600)
        assert not nico.failed
        dialogues = nico.get_dialogues()
        assert dialogues[0] and dialogues[1]  # 720S + transparent 720T
