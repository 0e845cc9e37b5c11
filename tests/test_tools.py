"""Side tools + genre/DRCS manager tests."""

import asyncio
import os
import stat

import pytest

from amatsukaze_tpu.server.drcs import DRCSManager
from amatsukaze_tpu.server.genre import (
    ARIB_GENRES,
    GenreItem,
    main_genre_name,
    parse_content_descriptor,
    sub_genre_name,
    unknown_name,
)
from amatsukaze_tpu.tools.file_cutter import cut_file
from amatsukaze_tpu.tools.hash_check import (
    append_hash,
    check_hash_list,
    copy_with_hash,
    file_hash,
    make_hash_list,
    read_hash_file,
)


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


class TestGenre:
    def test_main_names(self):
        assert main_genre_name(GenreItem(level1=0x3)) == "ドラマ"
        assert main_genre_name(GenreItem(level1=0x7)) == "アニメ／特撮"
        assert main_genre_name(GenreItem(level1=0xC)) is None  # reserved

    def test_sub_names(self):
        assert sub_genre_name(GenreItem(level1=0x1, level2=0x1)) \
            == "スポーツ - 野球"
        assert sub_genre_name(GenreItem(level1=0x3, level2=0xF)) \
            == "ドラマ - その他"
        assert sub_genre_name(GenreItem(level1=0x3, level2=0x9)) is None

    def test_unknown(self):
        assert "(12)" in unknown_name(GenreItem(level1=12))

    def test_parse_content_descriptor(self):
        items = parse_content_descriptor(bytes([0x30, 0xFF, 0x71, 0xFF]))
        assert items[0].level1 == 0x3 and items[0].level2 == 0x0
        assert items[1].level1 == 0x7 and items[1].level2 == 0x1

    def test_all_mains_have_other(self):
        for lvl1, (name, subs) in ARIB_GENRES.items():
            if lvl1 in (0xE,):
                continue
            assert 0xF in subs


class TestHashCheck:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "files"
        d.mkdir()
        (d / "a.bin").write_bytes(b"hello")
        (d / "b.bin").write_bytes(b"world" * 1000)
        hash_path = make_hash_list(str(d))
        ok, failures = check_hash_list(hash_path)
        assert ok and not failures
        # corrupt one
        (d / "a.bin").write_bytes(b"HELLO")
        ok, failures = check_hash_list(hash_path)
        assert not ok
        assert failures == [("a.bin", "hash mismatch")]

    def test_missing_file(self, tmp_path):
        p = tmp_path / "x.hash"
        append_hash(str(p), "gone.bin", b"\x00" * 64)
        ok, failures = check_hash_list(str(p), str(tmp_path))
        assert failures == [("gone.bin", "missing")]

    def test_corrupt_hash_file(self, tmp_path):
        p = tmp_path / "bad.hash"
        p.write_text("short line\n" + "A" * 130 + "  name\n")
        with pytest.raises(IOError):
            read_hash_file(str(p))

    def test_trailing_short_line_ok(self, tmp_path):
        p = tmp_path / "ok.hash"
        append_hash(str(p), "f", b"\x11" * 64)
        with open(p, "a") as f:
            f.write("eof")
        m = read_hash_file(str(p))
        assert list(m) == ["f"]

    def test_copy_with_hash(self, tmp_path):
        src = tmp_path / "s.bin"
        src.write_bytes(os.urandom(5 * 1024 * 1024))
        dst = tmp_path / "d.bin"
        digest = copy_with_hash(str(src), str(dst))
        assert dst.read_bytes() == src.read_bytes()
        assert digest == file_hash(str(src))


class TestFileCutter:
    def test_cut(self, tmp_path):
        src = tmp_path / "s"
        src.write_bytes(bytes(range(256)) * 10)
        dst = tmp_path / "d"
        n = cut_file(str(src), str(dst), 100, 500)
        assert n == 400
        assert dst.read_bytes() == src.read_bytes()[100:500]

    def test_cut_to_eof(self, tmp_path):
        src = tmp_path / "s"
        src.write_bytes(b"x" * 777)
        dst = tmp_path / "d"
        assert cut_file(str(src), str(dst), 700) == 77


class TestDRCSManager(object):
    def test_scan_and_map(self, ctx, tmp_path):
        d = tmp_path / "drcs"
        d.mkdir()
        md5 = "0" * 31 + "a"
        (d / f"{md5}.bmp").write_bytes(b"BM fake")
        mgr = DRCSManager(ctx, str(d))
        unmapped = mgr.unmapped()
        assert [i.md5 for i in unmapped] == [md5]
        mgr.add_mapping(md5, "〓")
        assert not mgr.unmapped()
        assert mgr.load_map()[md5] == "〓"
        assert ctx.drcs_map[md5] == "〓"

    def test_log_pairing(self, ctx, tmp_path):
        d = tmp_path / "drcs"
        d.mkdir()
        log = tmp_path / "enc.log"
        md5 = "ab" * 16
        log.write_text(f"... unmapped DRCS {md5} in caption ...\n")
        mgr = DRCSManager(ctx, str(d))
        mgr.add_log_file(str(log), "src.ts", 123.0)
        imgs = mgr.update()
        assert imgs[0].md5 == md5
        assert imgs[0].sources == [("src.ts", 123.0)]

    def test_listener(self, ctx, tmp_path):
        mgr = DRCSManager(ctx, str(tmp_path))
        seen = []
        mgr.add_listener(lambda imgs: seen.append(len(imgs)))
        mgr.update()
        assert seen == [0]


class TestScriptCommandRPC:
    def test_tag_priority_outfiles(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.rpc import RpcClient
            from amatsukaze_tpu.server.server import EncodeServer

            slow = asyncio.Event()

            async def fake_run(server, wid, entry, phase):
                await slow.wait()  # keep the item in 'queue'-adjacent state
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "data"),
                                  run_item=fake_run)
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            res = await client.call("AddQueue", {"src": "/tmp/x.ts"})
            item_id = res["item_id"]
            res = await client.call("AddTag", {"item_id": item_id,
                                               "tag": "drama"})
            assert res["tags"] == ["drama"]
            entry = server.entries[item_id]
            entry.state = "queue"  # SetPriority only applies to queued items
            res = await client.call("SetPriority", {"item_id": item_id,
                                                    "priority": 5})
            assert entry.priority == 5
            slow.set()
            server.entries[item_id].out_files = ["/out/a.mp4"]
            res = await client.call("GetOutFiles", {"item_id": item_id})
            assert res["out_files"] == ["/out/a.mp4"]
            await server.stop()

        run(main())

    def test_user_script_env_and_callback(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.tools.user_script import run_user_script

            async def fake_run(server, wid, entry, phase):
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "data"),
                                  run_item=fake_run)
            port = await server.start(port=0)
            entry = server.add_queue("/tmp/in.ts", "/tmp/out")
            script = tmp_path / "pre.sh"
            script.write_text(
                "#!/bin/bash\n"
                "echo item=$ITEM_ID mode=$ITEM_MODE\n"
                "python -m amatsukaze_tpu.tools.script_command "
                "AddTag from-script\n")
            script.chmod(script.stat().st_mode | stat.S_IEXEC)
            rc = await run_user_script(ctx, str(script), entry, "pre",
                                       server_port=port)
            assert rc == 0
            assert entry.tags == ["from-script"]
            await server.stop()

        run(main())


class TestRename:
    def test_escape_filename(self):
        from amatsukaze_tpu.server.rename import escape_filename
        assert escape_filename('a/b:c*d?"<>|') == "a／b：c＊d？”＜＞｜"

    def test_format_tokens(self):
        import datetime
        from amatsukaze_tpu.server.rename import format_output_name
        out = format_output_name(
            "$time$_$title$ ($service$)",
            event_name="ニュース7", service_name="NHK総合",
            time=datetime.datetime(2026, 8, 16, 19, 0))
        assert out == "202608161900_ニュース7 (NHK総合)"

    def test_rename_output_no_info(self):
        from amatsukaze_tpu.server.rename import rename_output

        class Item:
            src_path = "/rec/a.ts"
            event_name = ""
            service_name = ""
            ts_time = None

        assert rename_output(Item(), "$title$") is None

    def test_server_applies_rename(self, ctx, tmp_path):
        import ts_gen
        from amatsukaze_tpu.server.server import EncodeServer, ProfileSetting

        src = tmp_path / "rec.ts"
        src.write_bytes(ts_gen.build_simple_ts(num_frames=60, si=True,
                                               service_name="TEST TV",
                                               event_name="My Show"))

        async def main():
            async def fake_run(server, wid, entry, phase):
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=fake_run)
            server.profiles["default"] = ProfileSetting(
                rename_format="$title$ [$service$]")
            entry = server.add_queue(str(src), str(tmp_path / "out" / "rec"))
            assert entry.event_name == "My Show"
            assert entry.service_name == "TEST TV"
            assert entry.out_path.endswith("My Show [TEST TV]")

        run(main())


class TestWakeOnLan:
    def test_magic_packet_format(self):
        from amatsukaze_tpu.tools.add_task import wol_magic_packet

        pkt = wol_magic_packet("01:23:45:67:89:ab")
        assert len(pkt) == 102
        assert pkt[:6] == b"\xff" * 6
        mac = bytes([0x01, 0x23, 0x45, 0x67, 0x89, 0xAB])
        for i in range(16):
            assert pkt[6 + 6 * i:12 + 6 * i] == mac
        # dash separators accepted too
        assert wol_magic_packet("01-23-45-67-89-AB") == pkt
        import pytest as _pytest
        with _pytest.raises(ValueError):
            wol_magic_packet("not-a-mac")

    def test_send_wol_local(self):
        """Send a magic packet to a local UDP socket and verify receipt."""
        import socket

        from amatsukaze_tpu.tools.add_task import send_wol, wol_magic_packet

        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        rx.settimeout(2.0)
        port = rx.getsockname()[1]
        send_wol("de:ad:be:ef:00:01", broadcast="127.0.0.1", port=port)
        data, _ = rx.recvfrom(256)
        rx.close()
        assert data == wol_magic_packet("de:ad:be:ef:00:01")
