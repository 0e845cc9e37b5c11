"""Scheduler + server tests (model: the reference's live resource-protocol
loop test, AmatsukazeTestImpl.hpp:694-716, adapted to asyncio)."""

import asyncio
import os

import pytest

from amatsukaze_tpu.parallel.scheduler import (
    PHASES,
    PhaseScheduler,
    QueueItem,
    ReqResource,
    ResourceManager,
    ScheduledQueue,
    WorkerPool,
)


def run(coro):
    return asyncio.run(coro)


class TestResourceManager:
    def test_basic_acquire_release(self):
        async def main():
            rm = ResourceManager()
            res = await rm.get_resource(ReqResource(50, 10, 0))
            assert rm.cur_cpu == 50
            rm.release_resource(res)
            assert rm.cur_cpu == 0

        run(main())

    def test_cost_max_over_budget(self):
        rm = ResourceManager()
        rm.set_gpu_resources(2, [100, 100])
        rm.force_get_resource(ReqResource(80, 0, 0))
        assert rm.resource_cost(ReqResource(30, 0, 0)) == 10
        assert rm.resource_cost(ReqResource(10, 0, 0)) == -10

    def test_most_capable_gpu(self):
        rm = ResourceManager()
        rm.set_gpu_resources(2, [100, 100])
        r1 = rm.force_get_resource(ReqResource(0, 0, 60))
        r2 = rm.force_get_resource(ReqResource(0, 0, 60))
        assert {r1.gpu_index, r2.gpu_index} == {0, 1}

    def test_waiters_block_until_release(self):
        async def main():
            rm = ResourceManager()
            first = await rm.get_resource(ReqResource(80, 0, 0))
            acquired = []

            async def waiter():
                res = await rm.get_resource(ReqResource(80, 0, 0))
                acquired.append(res)

            task = asyncio.ensure_future(waiter())
            await asyncio.sleep(0.01)
            assert not acquired
            rm.release_resource(first)
            await asyncio.wait_for(task, 1.0)
            assert acquired

        run(main())

    def test_encoder_index_allocation(self):
        rm = ResourceManager()
        r1 = rm.force_get_resource(ReqResource(), req_encoder_index=True)
        r2 = rm.force_get_resource(ReqResource(), req_encoder_index=True)
        assert (r1.encoder_index, r2.encoder_index) == (0, 1)
        rm.release_resource(r1)
        r3 = rm.force_get_resource(ReqResource(), req_encoder_index=True)
        assert r3.encoder_index == 0  # freed index is reused


class TestScheduledQueue:
    def make_item(self, i, priority=3, gpu=0):
        return QueueItem(item_id=i, priority=priority, order=i,
                         req_resources={"Encode": ReqResource(10, 10, gpu)})

    def test_priority_order(self):
        q = ScheduledQueue(enable_resource_scheduling=False)
        q.add_queue(self.make_item(1, priority=1))
        q.add_queue(self.make_item(2, priority=5))
        q.add_queue(self.make_item(3, priority=3))
        assert q.pop_item().item_id == 2
        assert q.pop_item().item_id == 3
        assert q.pop_item().item_id == 1
        assert q.pop_item() is None

    def test_resource_scheduling_prefers_free(self):
        q = ScheduledQueue()
        q.resource_manager.set_gpu_resources(1, [100])
        # occupy the device
        q.resource_manager.force_get_resource(ReqResource(0, 0, 90))
        q.add_queue(self.make_item(1, priority=3, gpu=50))  # over budget
        q.add_queue(self.make_item(2, priority=3, gpu=0))  # fits
        assert q.pop_item().item_id == 2

    def test_priority5_always_first_section(self):
        q = ScheduledQueue()
        q.resource_manager.force_get_resource(ReqResource(0, 0, 90))
        q.add_queue(self.make_item(1, priority=5, gpu=50))  # over budget but P5
        q.add_queue(self.make_item(2, priority=3, gpu=0))
        assert q.pop_item().item_id == 1

    def test_release(self):
        q = ScheduledQueue()
        q.add_queue(self.make_item(1))
        item = q.pop_item()
        q.release_item(item)
        assert not q.actives

    def test_active_items_do_not_consume_phase_capacity(self):
        """Active-item tracking is ordering-only (Scheduler.cs:379-425):
        popping items must not reserve ResourceManager capacity, or
        num_parallel>=2 jobs with default profile reqs deadlock in their
        first phase wait (regression: 3 popped Encode(cpu=50) items left
        cur_cpu=150 and every TSAnalyze(cpu=20) wait blocked forever)."""
        q = ScheduledQueue()
        for i in range(1, 4):
            q.add_queue(QueueItem(item_id=i, priority=3, order=i,
                                  req_resources={
                                      "Encode": ReqResource(50, 10, 30)}))
        items = [q.pop_item() for _ in range(3)]
        assert all(items)
        rm = q.resource_manager
        assert rm.cur_cpu == 0 and rm.cur_hdd == 0
        # every job's first phase fits immediately against live usage
        assert rm.resource_cost(ReqResource(20, 30, 0)) <= 0
        # but ordering still sees the committed work
        assert q._order_cost(ReqResource(50, 10, 30)) > 0

    def test_parallel_jobs_phase_waits_complete(self):
        """Three num_parallel=3 jobs walking all five phases with the
        default profile ReqResources must complete (the deadlock above
        showed up end-to-end through EncodeServer)."""
        import os
        import tempfile

        from amatsukaze_tpu.server.server import EncodeServer
        from amatsukaze_tpu.utils.context import AMTContext

        async def run_item(server, worker_id, entry, phase):
            for name in PHASES:
                await phase.wait_async(name)
                await asyncio.sleep(0.01)
            return True

        async def main():
            tmp = tempfile.mkdtemp()
            src = os.path.join(tmp, "s.ts")
            with open(src, "wb") as f:
                f.write(b"G" + bytes(187))
            ctx = AMTContext(level="error")
            s = EncodeServer(ctx, data_dir=os.path.join(tmp, "d"),
                             run_item=run_item)
            s.setting.num_parallel = 3
            s.setting.work_dir = tmp
            await s.start(port=0)
            ids = [s.add_queue(src, os.path.join(tmp, f"o{k}")).item_id
                   for k in range(3)]
            for _ in range(400):
                await asyncio.sleep(0.01)
                if {s.entries[i].state for i in ids} <= {"complete",
                                                         "failed"}:
                    break
            states = [s.entries[i].state for i in ids]
            await s.stop()
            assert states == ["complete"] * 3, states

        run(main())


class TestWorkerPool:
    def test_parallel_execution(self):
        async def main():
            done = []
            q = ScheduledQueue(enable_resource_scheduling=False)

            async def run_item(wid, item, force):
                await asyncio.sleep(0.01)
                done.append(item.item_id)

            pool = WorkerPool(q, run_item)
            pool.set_num_parallel(2)
            for i in range(6):
                q.add_queue(QueueItem(item_id=i, priority=3, order=i,
                                      req_resources={}))
            for _ in range(100):
                await asyncio.sleep(0.01)
                if len(done) == 6:
                    break
            assert sorted(done) == list(range(6))

        run(main())

    def test_pause_stops_scheduling(self):
        async def main():
            done = []
            q = ScheduledQueue(enable_resource_scheduling=False)

            async def run_item(wid, item, force):
                done.append(item.item_id)

            pool = WorkerPool(q, run_item)
            pool.set_num_parallel(1)
            pool.set_pause(True)
            q.add_queue(QueueItem(item_id=1, priority=3, order=0, req_resources={}))
            await asyncio.sleep(0.05)
            assert not done
            pool.set_pause(False)
            await asyncio.sleep(0.05)
            assert done == [1]

        run(main())

    def test_force_start_bypasses_pause(self):
        async def main():
            done = []
            q = ScheduledQueue(enable_resource_scheduling=False)

            async def run_item(wid, item, force):
                done.append((item.item_id, force))

            pool = WorkerPool(q, run_item)
            pool.set_num_parallel(1)
            pool.set_pause(True)
            item = QueueItem(item_id=9, priority=3, order=0, req_resources={})
            pool.force_start(item)
            await asyncio.sleep(0.05)
            assert done == [(9, True)]

        run(main())


class TestPhaseScheduler:
    def test_phase_protocol_loop(self):
        """The reference tests the 5-phase protocol with a 10000x live loop
        (ResourceTest); here a few hundred async cycles across 3 jobs."""

        async def main():
            rm = ResourceManager()
            reqs = {
                "TSAnalyze": ReqResource(30, 40, 0),
                "CMAnalyze": ReqResource(30, 10, 40),
                "Filter": ReqResource(30, 10, 60),
                "Encode": ReqResource(60, 10, 30),
                "Mux": ReqResource(10, 40, 0),
            }

            async def job():
                ps = PhaseScheduler(rm, reqs, loop=asyncio.get_running_loop())
                for _ in range(30):
                    for phase in PHASES:
                        await ps.wait_async(phase)
                        await asyncio.sleep(0)
                ps.release()

            await asyncio.wait_for(
                asyncio.gather(job(), job(), job()), timeout=30.0
            )
            assert rm.cur_cpu == 0 and rm.cur_hdd == 0
            assert all(g == 0 for g in rm.cur_gpu)

        run(main())


class TestEncodeServer:
    def test_rpc_round_trip(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            async def fake_run(server, wid, entry, phase):
                await phase.wait_async("TSAnalyze")
                await phase.wait_async("Encode")
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "data"),
                                  run_item=fake_run)
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)

            r = await client.call("AddQueue", {"src": "a.ts", "out": "a"})
            assert r["item_id"] == 1
            r = await client.call("GetQueue")
            assert len(r) == 1

            # wait for the fake encode to finish
            for _ in range(100):
                await asyncio.sleep(0.02)
                q = await client.call("GetQueue")
                if q[0]["state"] == "complete":
                    break
            assert q[0]["state"] == "complete"

            r = await client.call("GetLogs")
            assert len(r) == 1 and r[0]["state"] == "complete"

            r = await client.call("SetProfile", {"name": "anime",
                                                 "encoder_type": "x265"})
            r = await client.call("GetProfiles")
            assert "anime" in r

            client.close()
            await server.stop()

        run(main())

    def test_queue_persistence(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            async def never_run(server, wid, entry, phase):
                await asyncio.sleep(100)
                return True

            s1 = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                              run_item=never_run)
            s1.setting.num_parallel = 0  # don't start anything
            port = await s1.start(port=0)
            s1.add_queue("x.ts", "x")
            await s1.stop()

            s2 = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                              run_item=never_run)
            s2.setting.num_parallel = 0
            await s2.start(port=0)
            assert len(s2.entries) == 1
            assert list(s2.entries.values())[0].src_path == "x.ts"
            await s2.stop()

        run(main())

    def test_change_item_ops(self, ctx, tmp_path):
        """ChangeItem RPC covering the reference's ChangeItemType set
        (EncodeServerData.cs:782-795): priority, move, duplicate,
        force-start preconditions, reset, remove, remove_completed,
        remove_source."""
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            s = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            s.setting.num_parallel = 0  # nothing actually runs
            await s.start(port=0)
            src_file = tmp_path / "a.ts"
            src_file.write_bytes(b"x" * 188)
            e1 = s.add_queue(str(src_file), "a", priority=3)
            e2 = s.add_queue(str(src_file), "b", priority=3)

            async def rpc(typ, item_id, **kw):
                return await s.handle_request(
                    "ChangeItem", {"item_id": item_id, "type": typ, **kw})

            # priority re-queues the scheduler item at the new level
            r = await rpc("priority", e1.item_id, priority=5)
            assert r["ok"] and s.entries[e1.item_id].priority == 5
            it = s._pending_item(e1.item_id)
            assert it is not None and it.priority == 5
            # move_top adjusts the per-bucket order
            r = await rpc("move_top", e2.item_id)
            assert r["ok"]
            assert s._pending_item(e2.item_id).order < \
                s._pending_item(e1.item_id).order
            # duplicate adds a fresh entry
            r = await rpc("duplicate", e1.item_id)
            assert r["ok"] and r["item_id"] in s.entries
            # profile change rebuilds the scheduler item
            s.profiles["alt"] = type(s.profiles["default"])(name="alt")
            r = await rpc("profile", e1.item_id, profile="alt")
            assert r["ok"]
            assert s.entries[e1.item_id].profile_name == "alt"
            # reset only from finished states
            assert not (await rpc("reset", e1.item_id))["ok"]
            s.entries[e1.item_id].state = "failed"
            s.queue.remove_queue(s._pending_item(e1.item_id))
            r = await rpc("reset", e1.item_id)
            assert r["ok"] and s.entries[e1.item_id].state == "queue"
            # remove drops entry + scheduler item
            r = await rpc("remove", e2.item_id)
            assert r["ok"] and e2.item_id not in s.entries
            assert s._pending_item(e2.item_id) is None
            # remove_source only for completed items; the file goes away
            s.entries[e1.item_id].state = "complete"
            r = await rpc("remove_source", e1.item_id)
            assert r["ok"] and not src_file.exists()
            # remove_completed sweeps it
            r = await rpc("remove_completed", 0)
            assert r["ok"] and e1.item_id not in s.entries
            await s.stop()

        run(main())

    def test_make_cli_args(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import (
            EncodeServer, ProfileSetting, QueueEntry,
        )

        server = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
        profile = ProfileSetting(name="p", encoder_type="x265", chapter=True,
                                 logo_paths=["l.lgd"], cm_out_mask=6,
                                 auto_bitrate=True, bitrate_a=0.2,
                                 bitrate_b=300, bitrate_h264=1.2)
        entry = QueueEntry(item_id=1, src_path="in.ts", out_path="out",
                           service_id=100)
        args = server.make_cli_args(entry, profile)
        from amatsukaze_tpu.cli import args_to_config, build_parser

        conf = args_to_config(build_parser().parse_args(args))
        assert conf.encoder.value == "x265"
        assert conf.chapter and conf.logo_path == ["l.lgd"]
        assert conf.cm_out_mask == 6 and conf.service_id == 100
        assert conf.auto_bitrate and conf.bitrate.a == 0.2


class TestOrderedParallel:
    def test_round_robin_order(self):
        from amatsukaze_tpu.parallel.ordered import ordered_parallel

        out = list(ordered_parallel([iter("abc"), iter("xyz")]))
        assert out == [(0, "a"), (1, "x"), (0, "b"), (1, "y"),
                       (0, "c"), (1, "z")]

    def test_uneven_lengths(self):
        from amatsukaze_tpu.parallel.ordered import ordered_parallel

        out = list(ordered_parallel([iter([1, 2, 3, 4]), iter([10])]))
        assert out == [(0, 1), (1, 10), (0, 2), (0, 3), (0, 4)]

    def test_producer_error_propagates(self):
        from amatsukaze_tpu.parallel.ordered import ordered_parallel

        def bad():
            yield 1
            raise RuntimeError("boom")

        import pytest as _pytest
        gen = ordered_parallel([bad(), iter([7, 8])])
        with _pytest.raises(RuntimeError, match="boom"):
            list(gen)

    def test_slow_producer_overlap(self):
        import time
        from amatsukaze_tpu.parallel.ordered import ordered_parallel

        def slow(tag, delay):
            def gen():
                for i in range(4):
                    time.sleep(delay)
                    yield f"{tag}{i}"
            return gen()

        t0 = time.time()
        out = list(ordered_parallel([slow("a", 0.02), slow("b", 0.02)]))
        dt = time.time() - t0
        assert [x for _, x in out] == ["a0", "b0", "a1", "b1", "a2", "b2",
                                       "a3", "b3"]
        # producers ran concurrently: well under the serial 0.16 s
        assert dt < 0.14


class TestAutoSelect:
    def _server(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import EncodeServer, ProfileSetting

        async def fake_run(server, wid, entry, phase):
            return True

        s = EncodeServer(ctx, data_dir=str(tmp_path / "d"), run_item=fake_run)
        s.profiles["anime"] = ProfileSetting(name="anime")
        s.profiles["news"] = ProfileSetting(name="news")
        return s

    def test_eit_genre_auto_select_e2e(self, ctx, tmp_path):
        """End-to-end EIT genre chain (VERDICT r4 item 9): a REAL TS
        carrying an EIT content descriptor (genre anime, 0x7) is added
        via add_queue -> TsInfo probes the EIT -> the auto-select rule
        resolves the profile from the probed genre (ref the reference's
        EIT-driven auto-select, QueueManager TsInfo probing +
        AutoSelectProfile)."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        import ts_gen

        s = self._server(ctx, tmp_path)
        s.auto_select["default"] = [
            {"genre": [0x7], "profile": "anime"},
        ]
        src = tmp_path / "rec.ts"
        src.write_bytes(ts_gen.build_simple_ts(
            num_frames=60, width=96, height=64, si=True,
            event_name="Anime Hour"))
        e = s.add_queue(str(src), str(tmp_path / "out"))
        assert e.genres and e.genres[0][0] == 0x7
        assert e.event_name == "Anime Hour"
        assert s.profile_for(e).name == "anime"

    def test_genre_rule(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["default"] = [
            {"genre": [0x7], "profile": "anime"},
            {"genre": [0x0, 0x0], "profile": "news"},
        ]
        e = QueueEntry(1, "a.ts", "out", genres=[[7, 0]])
        assert s.profile_for(e).name == "anime"
        e2 = QueueEntry(2, "b.ts", "out", genres=[[0, 0]])
        assert s.profile_for(e2).name == "news"
        e3 = QueueEntry(3, "c.ts", "out", genres=[[0, 5]])
        assert s.profile_for(e3).name == "default"  # sub-genre mismatch

    def test_service_and_genre_combined(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [
            {"service_id": 1024, "genre": [0x7], "profile": "anime"},
        ]
        hit = QueueEntry(1, "a.ts", "o", service_id=1024, genres=[[7, 2]])
        miss = QueueEntry(2, "b.ts", "o", service_id=99, genres=[[7, 2]])
        assert s.profile_for(hit).name == "anime"
        assert s.profile_for(miss).name == "default"

    def test_legacy_pair_rule(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [(1032, "news")]
        e = QueueEntry(1, "a.ts", "o", service_id=1032)
        assert s.profile_for(e).name == "news"

    def test_filename_tag_size_conditions(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [
            {"file_name": "Movie", "profile": "anime"},
            {"tag": "late-night", "profile": "news"},
        ]
        assert s.profile_for(
            QueueEntry(1, "/rec/My Movie 01.ts", "o")).name == "anime"
        assert s.profile_for(
            QueueEntry(2, "/rec/other.ts", "o",
                       tags=["late-night"])).name == "news"
        assert s.profile_for(QueueEntry(3, "/rec/other.ts", "o")).name \
            == "default"

    def test_video_size_condition(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import EncodeServer, QueueEntry

        assert EncodeServer.video_size_class(1920) == "fullhd"
        assert EncodeServer.video_size_class(1440) == "hd1440"
        assert EncodeServer.video_size_class(720) == "sd"
        assert EncodeServer.video_size_class(320) == "oneseg"
        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [
            {"video_size": ["sd", "oneseg"], "profile": "news"},
            {"video_size": "fullhd", "profile": "anime"},
        ]
        assert s.profile_for(
            QueueEntry(1, "a.ts", "o", width=720, height=480)).name == "news"
        assert s.profile_for(
            QueueEntry(2, "b.ts", "o", width=1920, height=1080)).name \
            == "anime"

    def test_priority_override_and_service_ids(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [
            {"service_ids": [1024, 1032], "profile": "anime", "priority": 5},
        ]
        e = QueueEntry(1, "a.ts", "o", service_id=1032, priority=3)
        # priority applies only at queue admission (apply_priority=True);
        # later lookups must not clobber a user-set priority
        assert s.profile_for(e).name == "anime"
        assert e.priority == 3
        assert s.profile_for(e, apply_priority=True).name == "anime"
        assert e.priority == 5
        e.priority = 1  # user lowers it; a re-lookup keeps it
        s.profile_for(e)
        assert e.priority == 1

    def test_unprobed_size_never_matches_video_size(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [{"video_size": "oneseg", "profile": "news"}]
        e = QueueEntry(1, "a.ts", "o")  # probe failed: width stays 0
        assert s.profile_for(e).name == "default"

    def test_genre_and_genres_merge(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.auto_select["x"] = [
            {"genre": [7], "genres": [[8], [10]], "profile": "anime"},
        ]
        assert s.profile_for(
            QueueEntry(1, "a.ts", "o", genres=[[8, 1]])).name == "anime"
        assert s.profile_for(
            QueueEntry(2, "b.ts", "o", genres=[[9, 0]])).name == "default"

    def test_hash_dir_lookup_and_verified_copy(self, ctx, tmp_path):
        import asyncio, os
        from amatsukaze_tpu.tools.hash_check import append_hash, file_hash

        s = self._server(ctx, tmp_path)
        s.setting.work_dir = str(tmp_path / "work")
        nas = tmp_path / "nas"
        nas.mkdir()
        src = nas / "rec.ts"
        src.write_bytes(b"fake ts payload" * 100)
        append_hash(str(nas) + ".hash", "rec.ts", file_hash(str(src)))
        e = s.add_queue(str(src), str(tmp_path / "out.mp4"))
        assert e.hash == file_hash(str(src)).hex()
        assert e.state == "queue"
        # encode-time verified local copy
        local = s._verified_local_source(e, s.profiles["default"])
        assert local and os.path.exists(local)
        assert open(local, "rb").read() == src.read_bytes()
        os.remove(local)
        # tampered source -> mismatch raises
        src.write_bytes(b"tampered!" * 100)
        try:
            s._verified_local_source(e, s.profiles["default"])
            assert False, "expected hash mismatch"
        except IOError as ex:
            assert "hash mismatch" in str(ex)

    def test_hash_txt_variant_from_addtask(self, ctx, tmp_path):
        """AddTask writes <nas_dir>/hash.txt — the lookup accepts it."""
        from amatsukaze_tpu.tools.hash_check import append_hash, file_hash

        s = self._server(ctx, tmp_path)
        nas = tmp_path / "nas2"
        nas.mkdir()
        src = nas / "rec.ts"
        src.write_bytes(b"payload" * 50)
        append_hash(str(nas / "hash.txt"), "rec.ts", file_hash(str(src)))
        e = s.add_queue(str(src), str(tmp_path / "o.mp4"))
        assert e.hash == file_hash(str(src)).hex()

    def test_hash_dir_missing_entry_fails_item(self, ctx, tmp_path):
        from amatsukaze_tpu.tools.hash_check import append_hash

        s = self._server(ctx, tmp_path)
        nas = tmp_path / "nas"
        nas.mkdir()
        src = nas / "rec.ts"
        src.write_bytes(b"x" * 100)
        append_hash(str(nas) + ".hash", "other.ts", b"\x00" * 64)
        e = s.add_queue(str(src), str(tmp_path / "out.mp4"))
        assert e.state == "failed"
        assert any("no hash for" in line for line in e.console)

    def test_no_hash_dir_is_unverified(self, ctx, tmp_path):
        s = self._server(ctx, tmp_path)
        src = tmp_path / "rec.ts"
        src.write_bytes(b"x")
        e = s.add_queue(str(src), str(tmp_path / "out.mp4"))
        assert e.hash == "" and e.state in ("queue", "encoding", "complete")
        assert s._verified_local_source(e, s.profiles["default"]) is None

    def test_default_run_item_hash_flow(self, ctx, tmp_path, monkeypatch):
        """_default_run_item with a hash-dir source: encodes from a
        verified local copy, restores src_path, records out_files and
        appends their SHA-512s to _encoded.hash."""
        import asyncio, os
        from amatsukaze_tpu.tools.hash_check import (append_hash, file_hash,
                                                     read_hash_file)

        s = self._server(ctx, tmp_path)
        s.setting.work_dir = str(tmp_path / "work")
        nas = tmp_path / "nas"
        nas.mkdir()
        src = nas / "rec.ts"
        src.write_bytes(b"fake ts" * 64)
        append_hash(str(nas) + ".hash", "rec.ts", file_hash(str(src)))
        out_dir = tmp_path / "dest"
        out_dir.mkdir()
        e = s.add_queue(str(src), str(out_dir / "out.mp4"))

        seen = {}

        class FakePipeline:
            def __init__(self, ctx, settings, decoder_factory=None,
                         phase_scheduler=None):
                seen["src"] = settings.conf.src_file_path
                self.settings = settings

            def run(self):
                out = out_dir / "out.mp4"
                out.write_bytes(b"mp4!")
                return {"outfiles": [{"path": str(out)}]}

        import amatsukaze_tpu.pipeline.transcode as T
        monkeypatch.setattr(T, "TranscodePipeline", FakePipeline)
        ok = asyncio.run(s._default_run_item(s, 0, e, None))
        assert ok
        # encoded from the verified LOCAL copy, not the NAS path
        assert seen["src"].startswith(s.setting.work_dir)
        assert not os.path.exists(seen["src"])  # cleaned up after
        assert e.src_path == str(src)           # restored
        assert e.out_files == [str(out_dir / "out.mp4")]
        rec = read_hash_file(str(out_dir / "_encoded.hash"))
        assert rec["out.mp4"] == file_hash(str(out_dir / "out.mp4"))

    def test_genre_folder_sorting(self, ctx, tmp_path, monkeypatch):
        from amatsukaze_tpu.server.server import EncodeServer, ProfileSetting

        s = self._server(ctx, tmp_path)
        s.profiles["default"].enable_genre_folder = True
        src = tmp_path / "rec.ts"
        src.write_bytes(b"x")
        # monkeypatch the probe to supply a genre (no real TS here)
        def probe(entry):
            entry.genres = [[7, 0]]  # anime/tokusatsu main genre
        monkeypatch.setattr(s, "_probe_item", probe)
        e = s.add_queue(str(src), str(tmp_path / "out" / "rec.mp4"))
        parts = e.out_path.split(os.sep)
        # nibble 7 is the anime/tokusatsu main genre — the folder must be
        # the right genre's name, not just any folder
        from amatsukaze_tpu.server.genre import ARIB_GENRES
        assert parts[-2] == ARIB_GENRES[7][0]
        assert parts[-1] == "rec.mp4"
        # no genre info -> the explicit no-genre folder
        def probe2(entry):
            entry.genres = []
        monkeypatch.setattr(s, "_probe_item", probe2)
        e2 = s.add_queue(str(src), str(tmp_path / "out" / "rec2.mp4"))
        assert e2.out_path.split(os.sep)[-2] == "_ジャンル情報なし"

    def test_app_data_forward_compat(self, ctx, tmp_path):
        """App data written by a newer version (unknown keys) and one
        corrupt queue entry load without losing everything."""
        import json, os
        from amatsukaze_tpu.server.server import EncodeServer

        d = tmp_path / "data"
        d.mkdir()
        (d / "setting.json").write_text(json.dumps(
            {"num_parallel": 3, "future_knob": True}))
        (d / "profiles.json").write_text(json.dumps(
            {"default": {"name": "default", "new_field": 1}}))
        (d / "queue.json").write_text(json.dumps([
            {"item_id": 1, "src_path": "a.ts", "out_path": "o",
             "state": "complete", "unknown": "x"},
            "garbage-not-a-dict",
            {"item_id": 2, "src_path": "b.ts", "out_path": "o",
             "state": "complete"},
        ]))

        async def fake_run(server, wid, entry, phase):
            return True

        s = EncodeServer(ctx, data_dir=str(d), run_item=fake_run)
        s.load_app_data()
        assert s.setting.num_parallel == 3
        assert "default" in s.profiles
        assert set(s.entries) == {1, 2}

    def test_disk_space_dedup_and_missing_paths(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import QueueEntry

        s = self._server(ctx, tmp_path)
        s.setting.work_dir = str(tmp_path)
        # out dir does not exist yet: falls back to the nearest parent,
        # and same-mount paths are reported once
        e = QueueEntry(1, "a.ts", str(tmp_path / "not" / "yet" / "o.mp4"))
        s.entries[1] = e
        items = s.disk_space()
        assert len(items) == 1
        assert items[0]["total"] > 0
        assert 0 < items[0]["free"] <= items[0]["total"]


class TestServerOps:
    """Retry / disk space / finish action / instance lock / rolling console
    (ref TranscodeWorker retry, EncodeServer disk tracking,
    FinishActionRunner, ServerCLI single-instance mutex,
    RollingTextLines)."""

    def test_auto_retry_then_success(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            attempts = []

            async def flaky(server, wid, entry, phase):
                attempts.append(entry.item_id)
                return len(attempts) >= 2  # first run fails, retry succeeds

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=flaky)
            server.setting.max_retries = 2
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            await client.call("AddQueue", {"src": "a.ts", "out": "a"})
            for _ in range(200):
                await asyncio.sleep(0.02)
                q = await client.call("GetQueue")
                if q[0]["state"] == "complete":
                    break
            assert q[0]["state"] == "complete"
            assert q[0]["retry_count"] == 1
            assert len(attempts) == 2
            client.close()
            await server.stop()

        run(main())

    def test_retry_rpc_and_disk_space(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            async def fail(server, wid, entry, phase):
                return False

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=fail)
            server.setting.max_retries = 0
            server.setting.work_dir = str(tmp_path)
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            await client.call("AddQueue",
                              {"src": "a.ts", "out": str(tmp_path / "o")})
            for _ in range(200):
                await asyncio.sleep(0.02)
                q = await client.call("GetQueue")
                if q[0]["state"] == "failed":
                    break
            assert q[0]["state"] == "failed"
            r = await client.call("RetryItem", {"item_id": 1})
            assert r["ok"]
            disks = await client.call("GetDiskSpace")
            assert disks and all("free" in d and d["total"] > 0
                                 for d in disks)
            client.close()
            await server.stop()

        run(main())

    def test_finish_action_runs_on_drain(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            async def ok_run(server, wid, entry, phase):
                return True

            marker = tmp_path / "finished.marker"
            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            # arbitrary shell commands are NOT settable over RPC (only
            # the fixed suspend/shutdown set); the raw command path is
            # reserved for the locally-edited settings file
            res = await client.call("SetFinishAction",
                                    {"command": f"touch {marker}"})
            assert res["ok"] is False
            res = await client.call("SetFinishAction", {"command": "suspend"})
            assert res["ok"] is True
            server.setting.finish_action = f"touch {marker}"  # local config
            await client.call("AddQueue", {"src": "a.ts", "out": "a"})
            for _ in range(200):
                await asyncio.sleep(0.02)
                if marker.exists():
                    break
            assert marker.exists()
            client.close()
            await server.stop()

        run(main())

    def test_finish_countdown_and_cancel_sleep(self, ctx, tmp_path):
        """Finish action waits `finish_seconds` and CancelSleep aborts the
        countdown without disarming the action (ref FinishActionRunner
        Misc.cs:1602-1650, CancelSleep EncodeServer.cs:2607-2619)."""
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            async def ok_run(server, wid, entry, phase):
                return True

            marker = tmp_path / "fired.marker"
            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            res = await client.call("SetFinishAction",
                                    {"command": "suspend", "seconds": 60})
            assert res["ok"]
            assert server.setting.finish_seconds == 60
            server.setting.finish_action = f"touch {marker}"  # local config
            await client.call("AddQueue", {"src": "a.ts", "out": "a"})
            st = {}
            for _ in range(200):
                await asyncio.sleep(0.02)
                st = await client.call("GetState")
                if st.get("sleep_cancel", {}).get("command"):
                    break
            # countdown armed, not fired
            assert st["sleep_cancel"]["seconds"] == 60
            assert not marker.exists()
            res = await client.call("CancelSleep")
            assert res["canceled"] is True
            st = await client.call("GetState")
            assert st["sleep_cancel"] == {}
            # the action stays armed for the next drain
            assert server.setting.finish_action == f"touch {marker}"
            # canceling again is a no-op
            res = await client.call("CancelSleep")
            assert res["canceled"] is False
            await asyncio.sleep(0.05)
            assert not marker.exists()
            # next drain re-arms; with a zero countdown it fires
            server.setting.finish_seconds = 0
            await client.call("AddQueue", {"src": "b.ts", "out": "b"})
            for _ in range(200):
                await asyncio.sleep(0.02)
                if marker.exists():
                    break
            assert marker.exists()
            client.close()
            await server.stop()

        run(main())

    def test_add_scan_continues_past_bad_file(self, ctx, tmp_path):
        """One corrupt recording must not block the rest of a directory
        batch: the scan keeps going per file (ref QueueManager.cs per-file
        adds), reports the failure count, and ends 'done' when anything
        was added."""
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            async def ok_run(server, wid, entry, phase):
                return True

            rec = tmp_path / "rec"
            rec.mkdir()
            for name in ("a.ts", "bad.ts", "c.ts"):
                (rec / name).write_bytes(b"")
            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            await server.start(port=0)
            orig = server._prepare_entry

            def prepare(path, out, profile, priority, sid):
                if "bad.ts" in path:
                    raise RuntimeError("synthetic probe failure")
                return orig(path, out, profile, priority, sid)

            server._prepare_entry = prepare
            server.add_queue_dir(str(rec), out_dir=str(tmp_path / "o"))
            for _ in range(200):
                await asyncio.sleep(0.02)
                if server._add_scan["state"] in ("done", "failed"):
                    break
            assert server._add_scan["state"] == "done"
            assert server._add_scan["added"] == 2
            assert server._add_scan["failed"] == 1
            assert "bad.ts" in server._add_scan["error"]
            srcs = {e.src_path for e in server.entries.values()}
            assert srcs == {str(rec / "a.ts"), str(rec / "c.ts")}
            await server.stop()

        run(main())

    def test_add_queue_dir_and_cancel(self, ctx, tmp_path):
        """AddQueue with a directory batch-adds its .ts/.m2t files and
        CancelAddQueue stops the scan (ref QueueManager.cs:290-320 dir
        scan + :545-549 cancel)."""
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            async def ok_run(server, wid, entry, phase):
                return True

            rec = tmp_path / "rec"
            rec.mkdir()
            for name in ("a.ts", "b.M2T", "c.m2ts"):
                (rec / name).write_bytes(b"")
            (rec / "notes.txt").write_text("not a ts")
            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            res = await client.call("AddQueue", {"src": str(rec),
                                                 "out": str(tmp_path / "o")})
            assert res["ok"] and res["found"] == 3
            st = {}
            for _ in range(200):
                await asyncio.sleep(0.02)
                st = await client.call("GetState")
                if st["add_scan"]["state"] == "done":
                    break
            assert st["add_scan"]["added"] == 3
            q = await client.call("GetQueue")
            srcs = {e["src_path"] for e in q}
            assert srcs == {str(rec / "a.ts"), str(rec / "b.M2T"),
                            str(rec / "c.m2ts")}
            # outputs land in the requested out dir, extension stripped
            outs = {e["out_path"] for e in q}
            assert str(tmp_path / "o" / "a") in outs
            # cancel with nothing running is a no-op
            res = await client.call("CancelAddQueue")
            assert res["canceled"] is False
            # a second scan canceled before it runs adds nothing more
            # (driven in-process: over TCP the 3-file scan can finish
            # before a cancel RPC arrives)
            n_before = len(server.entries)
            res = server.add_queue_dir(str(rec))
            assert res["ok"]
            assert server.cancel_add_queue() is True
            await asyncio.sleep(0.05)
            assert server._add_scan["state"] == "canceled"
            assert len(server.entries) == n_before
            # only one scan at a time
            server._add_scan_task = asyncio.create_task(asyncio.sleep(10))
            res = server.add_queue_dir(str(rec))
            assert res["ok"] is False
            server._add_scan_task.cancel()
            client.close()
            await server.stop()

        run(main())

    def test_end_server_rpc(self, ctx, tmp_path):
        """EndServer sets the host shutdown event (ref
        ServerInterface.cs:34, EncodeServer.cs:3087-3091)."""
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.rpc import RpcClient

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            port = await server.start(port=0)
            client = await RpcClient.connect("127.0.0.1", port)
            assert not server.end_requested.is_set()
            res = await client.call("EndServer")
            assert res["ok"]
            assert server.end_requested.is_set()
            client.close()
            await server.stop()

        run(main())

    def test_single_instance_lock(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            a = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            await a.start(port=0)
            b = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            with pytest.raises(RuntimeError, match="already runs"):
                await b.start(port=0)
            await a.stop()
            # released: a third instance can start now
            c = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            await c.start(port=0)
            await c.stop()

        run(main())

    def test_console_rolling_cap(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import (
            CONSOLE_MAX_LINES, EncodeServer, QueueEntry)

        server = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
        e = QueueEntry(item_id=1, src_path="a", out_path="b")
        for i in range(CONSOLE_MAX_LINES + 50):
            server.append_console(e, f"line {i}")
        assert len(e.console) == CONSOLE_MAX_LINES
        assert e.console[0] == "line 50"


class TestWebServer:
    """Browser-client host (server/web.py + webui.html + server/cli.py) —
    the reference's GUI layer analog (AmatsukazeGUI WPF, SURVEY.md L7)."""

    async def _start(self, ctx, tmp_path):
        from amatsukaze_tpu.server.server import EncodeServer
        from amatsukaze_tpu.server.web import WebServer

        server = EncodeServer(ctx, data_dir=str(tmp_path / "data"))
        await server.start(port=0)
        web = WebServer(server)
        port = await web.start(port=0)
        return server, web, port

    def _get(self, port, path):
        import urllib.request

        return urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5).read()

    def _api(self, port, method, payload=None):
        import json
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/{method}",
            data=json.dumps(payload or {}).encode(),
            headers={"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(req, timeout=5).read())

    def test_item_detail_and_genre_browsing(self, ctx, tmp_path):
        """Round-5 GUI depth (VERDICT r4 item 8): per-item detail pane,
        colored console classes, and GenreData-driven genre browsing
        (ref the WPF client's DisplayData panes + GenreData.cs)."""
        async def main():
            server, web, port = await self._start(ctx, tmp_path)
            loop = asyncio.get_running_loop()
            html = (await loop.run_in_executor(
                None, self._get, port, "/")).decode()
            # the new client surfaces ship in the page
            for needle in ("itemDetail", "showItemDetail", "qGenre",
                           "consoleHtml", "con-err", "GetGenreTable",
                           "genreName"):
                assert needle in html, needle
            # ARIB genre nibble map over HTTP (drives the genre dropdown)
            table = await loop.run_in_executor(
                None, self._api, port, "GetGenreTable")
            assert table["3"]["name"] == "ドラマ"
            assert table["1"]["subs"]["1"] == "野球"
            # queue entries expose the fields the detail pane renders
            src = tmp_path / "a.ts"
            src.write_bytes(b"G" + bytes(187))
            await loop.run_in_executor(
                None, self._api, port, "AddQueue",
                {"src": str(src), "out": str(tmp_path / "out")})
            q = await loop.run_in_executor(None, self._api, port,
                                           "GetQueue")
            for k in ("genres", "out_files", "ts_time", "service_name",
                      "event_name", "console"):
                assert k in q[0], k
            await web.stop()
            await server.stop()

        run(main())

    def test_client_launch_mode(self, ctx, tmp_path):
        """Client launch mode (ref GUI launch type Client,
        AmatsukazeGUI/App.xaml.cs:45-57): the web host runs against an
        RPC proxy to a remote EncodeServer instead of an in-process
        one; /api requests ride the TCP RPC protocol end-to-end."""
        async def main():
            from amatsukaze_tpu.server.cli import RemoteServer
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.web import WebServer

            server = EncodeServer(ctx, data_dir=str(tmp_path / "data"))
            rpc_port = await server.start(port=0)
            web = WebServer(RemoteServer("127.0.0.1", rpc_port,
                                         str(tmp_path / "cdata")))
            port = await web.start(port=0)
            loop = asyncio.get_running_loop()
            st = await loop.run_in_executor(
                None, self._api, port, "GetState")
            assert st["paused"] is False
            # writes round-trip through the remote server
            await loop.run_in_executor(
                None, self._api, port, "SetSetting", {"num_parallel": 3})
            assert server.setting.num_parallel == 3
            # queue ops traverse the proxy too
            src = tmp_path / "c.ts"
            src.write_bytes(b"G" + bytes(187))
            await loop.run_in_executor(
                None, self._api, port, "AddQueue",
                {"src": str(src), "out": str(tmp_path / "out")})
            q = await loop.run_in_executor(None, self._api, port,
                                           "GetQueue")
            assert len(q) == 1 and q[0]["src_path"] == str(src)
            # file-backed extras 404 gracefully (no local data dir)
            import urllib.error
            with pytest.raises(urllib.error.HTTPError):
                await loop.run_in_executor(
                    None, self._get, port, "/drcs/none.bmp")
            await web.stop()
            await server.stop()

        run(main())

    def test_client_proxy_redials_after_server_restart(self, ctx, tmp_path):
        """RemoteServer must survive a remote-server restart: call()
        returns None on EOF (not a reply), the proxy drops the dead
        connection and transparently redials once."""
        async def main():
            import socket

            from amatsukaze_tpu.server.cli import RemoteServer
            from amatsukaze_tpu.server.server import EncodeServer

            with socket.socket() as s:  # pick a free fixed port
                s.bind(("127.0.0.1", 0))
                port = s.getsockname()[1]
            server = EncodeServer(ctx, data_dir=str(tmp_path / "d1"))
            await server.start(port=port)
            rs = RemoteServer("127.0.0.1", port, str(tmp_path / "c"))
            st = await rs.handle_request("GetState", {})
            assert st["paused"] is False
            # restart the remote server (new process-analog: same port)
            await server.stop()
            server2 = EncodeServer(ctx, data_dir=str(tmp_path / "d2"))
            await server2.start(port=port)
            st = await rs.handle_request("GetState", {})  # redials
            assert st["paused"] is False
            await server2.stop()

        run(main())

    def test_html_and_api(self, ctx, tmp_path):
        async def main():
            server, web, port = await self._start(ctx, tmp_path)
            loop = asyncio.get_running_loop()
            html = await loop.run_in_executor(None, self._get, port, "/")
            assert b"Amatsukaze TPU Server" in html
            st = await loop.run_in_executor(
                None, self._api, port, "GetState")
            assert st["paused"] is False
            await loop.run_in_executor(
                None, self._api, port, "SetSetting", {"num_parallel": 2})
            st = await loop.run_in_executor(
                None, self._api, port, "GetState")
            assert st["num_parallel"] == 2
            # unknown paths 404
            import urllib.error
            with pytest.raises(urllib.error.HTTPError):
                await loop.run_in_executor(None, self._get, port, "/nope")
            await web.stop()
            await server.stop()

        run(main())

    def test_finished_encode_stats_flow(self, ctx, tmp_path):
        """Full HTTP flow of the encode-detail panel (ref the WPF
        LogItem panel, DisplayData.cs): a REAL tiny encode runs through
        the server's default pipeline, then GetLogs over HTTP returns
        per-output bitrates, audio drift stats and the per-pass
        Total/FilterWait/EncoderWait split the panel renders; the HTML
        ships the panel plus queue filter/sort and the structured
        auto-select editor; SetAutoSelect round-trips a priority rule."""
        import stat
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        import mpeg2_enc as E
        import ts_gen

        async def main():
            from amatsukaze_tpu.server.server import EncodeServer
            from amatsukaze_tpu.server.web import WebServer
            from amatsukaze_tpu.ts.qp_extract import iter_picture_chunks

            W2, H2 = 96, 64
            frames = E.synth_frames(W2, H2, 18)
            enc = E.Mpeg2TestEncoder(E.EncConfig(
                W2, H2, qs=2, progressive=False, search=2,
                seq_every_i=True))
            es = enc.encode(frames, "I" + "P" * 17)
            src = tmp_path / "src.ts"
            src.write_bytes(ts_gen.build_simple_ts(
                width=W2, height=H2,
                video_es_frames=list(iter_picture_chunks(es))))
            fake = tmp_path / "fake_x264"
            fake.write_text(
                '#!/bin/bash\nout=""\nwhile [ $# -gt 0 ]; do case "$1" in '
                '-o) out="$2"; shift 2;; *) shift;; esac; done\n'
                'cat > "$out"\n')
            fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

            server = EncodeServer(ctx, data_dir=str(tmp_path / "data"))
            server.profiles["default"].encoder_path = str(fake)
            await server.start(port=0)
            web = WebServer(server)
            port = await web.start(port=0)
            loop = asyncio.get_running_loop()
            api = lambda m, p=None: loop.run_in_executor(
                None, self._api, port, m, p)

            # the webui ships the new panels
            html = await loop.run_in_executor(None, self._get, port, "/")
            for anchor in (b'id="logDetail"', b'id="qFilter"',
                           b'id="qSort"', b'id="autoRulesBody"',
                           b"saveAutoSelectRules"):
                assert anchor in html, anchor

            r = await api("AddQueue", {
                "src": str(src), "out": str(tmp_path / "out.mp4")})
            item = r["item_id"]
            for _ in range(600):
                await asyncio.sleep(0.1)
                q = await api("GetQueue")
                e = next(x for x in q if x["item_id"] == item)
                if e["state"] in ("complete", "failed"):
                    break
            assert e["state"] == "complete", e

            logs = await api("GetLogs")
            log = next(x for x in logs if x["id"] == item)
            rep = log["report"]
            # per-output bitrate rows (panel "Outputs" table)
            assert rep["outfiles"] and rep["outfiles"][0]["srcbitrate"] > 0
            assert "path" in rep["outfiles"][0]
            # audio drift stats (panel "Audio drift")
            for k in ("avgdiff", "maxdiff", "totalsrcframes",
                      "notincludedper"):
                assert k in rep["audiodiff"], k
            # per-pass wait split (panel "Per-pass waits")
            assert rep["encodewaits"] and "total" in rep["encodewaits"][0]
            assert rep["srcfilesize"] > 0 and rep["srcduration"] > 0

            # structured auto-select rules with priority override
            rules = {"rules": [{"service_id": 1024, "genre": [7],
                                "profile": "default", "priority": 5}]}
            await api("SetAutoSelect", rules)
            back = await api("GetAutoSelect")
            assert back == rules

            # log-file browsing (ref RequestLogFile/OnLogFile round
            # trip, ServerInterface.cs:38/531): the finished item's
            # full pipeline transcript is persisted and retrievable
            assert log.get("log_file"), log
            lf = await api("GetLogFile", {"id": item})
            assert lf["file"] == log["log_file"]
            # the per-item context captured real pipeline log lines
            assert "Total:" in lf["text"], lf["text"][:400]
            by_name = await api("GetLogFile", {"file": log["log_file"]})
            assert by_name["text"] == lf["text"]
            # unknown ids return empty, never an exception
            missing = await api("GetLogFile", {"id": 99999})
            assert missing["text"] == ""
            # the webui ships the search box + log pane anchors
            assert b'id="logSearch"' in html and b"renderLogs" in html

            await web.stop()
            await server.stop()

        run(main())

    def test_filter_editor_preview_and_save(self, ctx, tmp_path):
        """Structured filter editor flow: PreviewFilter compiles a
        FilterSetting dict live, and SetProfile round-trips the
        structured dict (the WPF FilterKFMPanel-class editing, SURVEY
        2.3 GUI row)."""
        async def main():
            server, web, port = await self._start(ctx, tmp_path)
            loop = asyncio.get_running_loop()
            pv = await loop.run_in_executor(
                None, self._api, port, "PreviewFilter",
                {"enable_deinterlace": True,
                 "deinterlace_algorithm": "KFM", "kfm_fps": "VFR",
                 "kfm_enable_ucf": False, "enable_deband": True})
            assert pv["mode"] == "kfm_vfr"
            assert "--kfm-no-ucf" in pv["args"]
            assert "deband" in " ".join(pv["args"])
            pv = await loop.run_in_executor(
                None, self._api, port, "PreviewFilter",
                {"enable_deinterlace": True,
                 "deinterlace_algorithm": "AutoVfr",
                 "auto_vfr_parallel": 4})
            assert pv["mode"] == "autovfr"
            assert pv["args"][-1] == "4"
            pv = await loop.run_in_executor(
                None, self._api, port, "PreviewFilter", {})
            assert pv == {"mode": "none", "args": []}
            # structured save/load through SetProfile
            profs = await loop.run_in_executor(
                None, self._api, port, "GetProfiles")
            p = dict(profs["default"])
            p["name"] = "webfs"
            p["filter_setting"] = {
                "enable_deinterlace": True,
                "deinterlace_algorithm": "Yadif", "yadif_fps": "CFR60",
                "enable_resize": True, "resize_width": 1280,
                "resize_height": 720}
            await loop.run_in_executor(
                None, self._api, port, "SetProfile", p)
            got = (await loop.run_in_executor(
                None, self._api, port, "GetProfiles"))["webfs"]
            assert got["filter_setting"]["yadif_fps"] == "CFR60"
            # the served page carries the editor
            html = (await loop.run_in_executor(
                None, self._get, port, "/")).decode()
            assert "filterEditor" in html and "PreviewFilter" in html
            await web.stop()
            await server.stop()

        run(main())

    def test_logo_png_render(self, ctx, tmp_path):
        async def main():
            import struct
            import zlib

            import numpy as np

            from amatsukaze_tpu.models.lgd import (
                LogoData, LogoHeader, save_lgd)

            server, web, port = await self._start(ctx, tmp_path)
            h = LogoHeader(w=32, h=16, imgw=1440, imgh=1080,
                           name="Logo X", service_id=7)
            d = LogoData.create(h)
            save_lgd(os.path.join(server.logo_dir(), "x.lgd"), d)
            loop = asyncio.get_running_loop()
            files = await loop.run_in_executor(
                None, self._api, port, "GetLogoFiles")
            assert files == [{"file": "x.lgd", "name": "Logo X",
                              "width": 32, "height": 16}]
            png = await loop.run_in_executor(
                None, self._get, port, "/logo/x.lgd.png")
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            w, hh = struct.unpack(">II", png[16:24])
            assert (w, hh) == (32, 16)
            # IDAT decompresses to h*(1+3w) filtered bytes
            idat, i = b"", 8
            while i < len(png):
                ln, tag = struct.unpack(">I4s", png[i:i + 8])
                if tag == b"IDAT":
                    idat += png[i + 8:i + 8 + ln]
                i += 12 + ln
            assert len(zlib.decompress(idat)) == hh * (1 + 3 * w)
            # rename through the API
            await loop.run_in_executor(
                None, self._api, port, "RenameLogo",
                {"file": "x.lgd", "name": "Renamed"})
            files = await loop.run_in_executor(
                None, self._api, port, "GetLogoFiles")
            assert files[0]["name"] == "Renamed"
            await web.stop()
            await server.stop()

        run(main())

    def test_drcs_flow(self, ctx, tmp_path):
        async def main():
            server, web, port = await self._start(ctx, tmp_path)
            md5 = "ab" * 16
            os.makedirs(server.drcs_dir(), exist_ok=True)
            with open(os.path.join(server.drcs_dir(), md5 + ".bmp"),
                      "wb") as f:
                f.write(b"BMfake")
            loop = asyncio.get_running_loop()
            imgs = await loop.run_in_executor(
                None, self._api, port, "GetDrcsImages")
            assert imgs[0]["md5"] == md5 and imgs[0]["map"] is None
            r = await loop.run_in_executor(
                None, self._api, port, "AddDrcsMapping",
                {"md5": md5, "text": "外"})
            assert r["ok"]
            imgs = await loop.run_in_executor(
                None, self._api, port, "GetDrcsImages")
            assert imgs[0]["map"] == "外"
            bmp = await loop.run_in_executor(
                None, self._get, port, f"/drcs/{md5}.bmp")
            assert bmp == b"BMfake"
            await web.stop()
            await server.stop()

        run(main())

    def test_frame_scrub_endpoint(self, ctx, tmp_path):
        """/frame decodes real frames for the wizard's scrub + region
        picker (ref LogoGUISupport.hpp:160-275 media frame picker)."""
        async def main():
            import numpy as np

            server, web, port = await self._start(ctx, tmp_path)
            src = tmp_path / "src.ts"
            src.write_bytes(b"\x47" * 188)
            W, H = 64, 48

            def synth_frames(path):
                def it():
                    for i in range(60):
                        y = np.full((H, W), min(255, i * 4), np.uint8)
                        u = np.full((H // 2, W // 2), 128, np.uint8)
                        yield (y, u, u)
                return it(), W, H

            server.logo_frame_source = synth_frames
            loop = asyncio.get_running_loop()
            from urllib.parse import quote

            png0 = await loop.run_in_executor(
                None, self._get, port, f"/frame?src={quote(str(src))}&n=0")
            assert png0.startswith(b"\x89PNG")
            png10 = await loop.run_in_executor(
                None, self._get, port, f"/frame?src={quote(str(src))}&n=10")
            assert png10.startswith(b"\x89PNG")
            assert png10 != png0  # scrubbing really moves through frames
            # decode the pixel data back and check the luma level
            import struct as _struct
            import zlib as _zlib

            def first_pixel(png):
                i = png.index(b"IDAT") + 4
                ln = _struct.unpack(">I", png[i - 8:i - 4])[0]
                raw = _zlib.decompress(png[i:i + ln])
                return raw[1:4]  # after the filter byte: R,G,B

            assert first_pixel(png10)[0] > first_pixel(png0)[0]
            # missing source 404s
            import urllib.error
            with pytest.raises(urllib.error.HTTPError):
                await loop.run_in_executor(
                    None, self._get, port, "/frame?src=/nope&n=0")
            await web.stop()
            await server.stop()

        run(main())

    def test_frame_endpoint_then_scan_flow(self, ctx, tmp_path):
        """The full wizard flow over HTTP: scrub a frame, pick the logo
        rect, start the scan, poll to done."""
        async def main():
            import numpy as np

            server, web, port = await self._start(ctx, tmp_path)
            src = tmp_path / "src.ts"
            src.write_bytes(b"\x47" * 188)
            W, H = 96, 64
            LW, LH = 24, 16
            rng = np.random.default_rng(0)
            yy, xx = np.mgrid[0:LH, 0:LW]
            alpha = np.clip(
                1.1 - np.hypot((yy - LH / 2) / (LH / 2),
                               (xx - LW / 2) / (LW / 2)), 0, 1) * 0.35

            def synth_frames(path):
                def it():
                    for i in range(200):
                        bg = float(rng.uniform(30, 140))
                        y = np.full((H, W), bg, np.float32)
                        win = y[8:8 + LH, 8:8 + LW]
                        y[8:8 + LH, 8:8 + LW] = \
                            (1 - alpha) * win + alpha * 200.0
                        y += rng.normal(0, 0.7, y.shape)
                        u = np.full((H // 2, W // 2), 128, np.uint8)
                        yield (np.clip(y, 0, 255).astype(np.uint8), u, u)
                return it(), W, H

            server.logo_frame_source = synth_frames
            loop = asyncio.get_running_loop()
            from urllib.parse import quote

            png = await loop.run_in_executor(
                None, self._get, port, f"/frame?src={quote(str(src))}&n=3")
            assert png.startswith(b"\x89PNG")
            r = await loop.run_in_executor(
                None, self._api, port, "ScanLogo",
                {"src": str(src), "rect": [8, 8, LW, LH],
                 "name": "wizard", "service_id": 7})
            assert r["ok"], r
            for _ in range(300):
                await asyncio.sleep(0.05)
                st = await loop.run_in_executor(
                    None, self._api, port, "GetState")
                if st["logo_scan"]["state"] in ("done", "failed"):
                    break
            assert st["logo_scan"]["state"] == "done", st["logo_scan"]
            files = await loop.run_in_executor(
                None, self._api, port, "GetLogoFiles")
            assert any(f["name"] == "wizard" for f in files)
            await web.stop()
            await server.stop()

        run(main())

    def test_logo_scan_background(self, ctx, tmp_path):
        async def main():
            import numpy as np

            server, web, port = await self._start(ctx, tmp_path)
            src = tmp_path / "src.ts"
            src.write_bytes(b"\x47" * 188)

            W, H = 96, 64
            LW, LH = 24, 16
            rng = np.random.default_rng(0)
            yy, xx = np.mgrid[0:LH, 0:LW]
            alpha = np.clip(
                1.1 - np.hypot((yy - LH / 2) / (LH / 2),
                               (xx - LW / 2) / (LW / 2)), 0, 1) * 0.35

            def synth_frames(path):
                def it():
                    for i in range(200):
                        bg = float(rng.uniform(30, 140))
                        y = np.full((H, W), bg, np.float32)
                        win = y[8:8 + LH, 8:8 + LW]
                        y[8:8 + LH, 8:8 + LW] = \
                            (1 - alpha) * win + alpha * 200.0
                        y += rng.normal(0, 0.7, y.shape)
                        u = (122.0 + 8 * rng.random()
                             + 2 * rng.random((H // 2, W // 2)))
                        v = (122.0 + 8 * rng.random()
                             + 2 * rng.random((H // 2, W // 2)))
                        yield (np.clip(y, 0, 255).astype(np.uint8),
                               u.astype(np.uint8), v.astype(np.uint8))
                return it(), W, H

            server.logo_frame_source = synth_frames
            loop = asyncio.get_running_loop()
            r = await loop.run_in_executor(
                None, self._api, port, "ScanLogo",
                {"src": str(src), "rect": [8, 8, 24, 16],
                 "name": "scanned", "service_id": 5})
            assert r["ok"], r
            for _ in range(300):
                await asyncio.sleep(0.05)
                st = await loop.run_in_executor(
                    None, self._api, port, "GetState")
                if st["logo_scan"]["state"] in ("done", "failed"):
                    break
            assert st["logo_scan"]["state"] == "done", st["logo_scan"]
            files = await loop.run_in_executor(
                None, self._api, port, "GetLogoFiles")
            assert any(f["name"] == "scanned" for f in files)
            # bad request paths
            r = await loop.run_in_executor(
                None, self._api, port, "ScanLogo",
                {"src": "/nonexistent", "rect": [0, 0, 8, 8]})
            assert not r["ok"]
            await web.stop()
            await server.stop()

        run(main())


class TestMoveAfterEncode:
    """Source move to succeeded/failed dirs with EDCB companions (ref
    TranscodeWorker + ServerSupport EDCB file moves)."""

    def test_moves_on_completion_and_failure(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            results = {"a.ts": True, "b.ts": False}

            async def fake_run(server, wid, entry, phase):
                return results[os.path.basename(entry.src_path)]

            server = EncodeServer(ctx, data_dir=str(tmp_path / "data"),
                                  run_item=fake_run)
            server.setting.move_after_encode = True
            server.setting.max_retries = 0
            await server.start(port=0)
            srcdir = tmp_path / "rec"
            srcdir.mkdir()
            for name in ("a.ts", "b.ts"):
                (srcdir / name).write_bytes(b"\x47" * 188)
                (srcdir / (name + ".err")).write_text("0 drops")
                (srcdir / (name + ".program.txt")).write_text("program")
            ea = server.add_queue(str(srcdir / "a.ts"), str(tmp_path / "a.mp4"))
            eb = server.add_queue(str(srcdir / "b.ts"), str(tmp_path / "b.mp4"))
            for _ in range(200):
                await asyncio.sleep(0.02)
                if all(e.state in ("complete", "failed")
                       for e in (ea, eb)):
                    break
            await asyncio.sleep(0.05)
            assert (srcdir / "succeeded" / "a.ts").exists()
            assert (srcdir / "succeeded" / "a.ts.err").exists()
            assert (srcdir / "succeeded" / "a.ts.program.txt").exists()
            assert (srcdir / "failed" / "b.ts").exists()
            assert (srcdir / "failed" / "b.ts.err").exists()
            assert not (srcdir / "a.ts").exists()
            assert ea.src_path.endswith("succeeded/a.ts")
            await server.stop()

        run(main())


class TestFilterSetting:
    """Structured filter settings (ref EncodeServerData.cs:132-194
    FilterSetting) compile to the declarative-graph CLI flags the way
    AvsScriptCreator compiles them to the AVS script."""

    def _fs(self, **kw):
        from amatsukaze_tpu.server.filter_setting import FilterSetting

        return FilterSetting(**kw)

    def test_mode_matrix(self):
        from amatsukaze_tpu.server.filter_setting import filter_mode_of

        fs = self._fs()
        assert filter_mode_of(fs) == "none"  # deinterlace off
        fs.enable_deinterlace = True
        for alg, fps, want in [
            ("KFM", "VFR", "kfm_vfr"), ("KFM", "VFR30", "kfm_vfr30"),
            ("KFM", "CFR24", "kfm_cfr24"), ("KFM", "SVP", "svp"),
            ("KFM", "CFR60", "qtgmc"), ("QTGMC", "VFR", "qtgmc"),
            ("Yadif", "CFR30", "yadif"), ("Yadif", "CFR60", "yadif60"),
            ("AutoVfr", "VFR", "autovfr"), ("D3DVP", "CFR30", "yadif"),
        ]:
            fs.deinterlace_algorithm = alg
            fs.kfm_fps = fps
            fs.yadif_fps = fps if alg in ("Yadif", "D3DVP") else "CFR30"
            assert filter_mode_of(fs) == want, (alg, fps)

    def test_args_compile(self):
        from amatsukaze_tpu.server.filter_setting import filter_setting_args

        fs = self._fs(enable_deinterlace=True, deinterlace_algorithm="KFM",
                      kfm_fps="VFR", kfm_enable_nr=True, kfm_enable_ucf=False,
                      enable_deblock=True, enable_deband=True,
                      enable_resize=True, resize_width=1280,
                      resize_height=720)
        args = filter_setting_args(fs)
        assert args == ["--filter-mode", "kfm_vfr",
                        "--post-filter", "deblock,nr,deband",
                        "--resize", "1280x720", "--kfm-no-ucf"]
        # the compiled args must PARSE through the real CLI
        from amatsukaze_tpu.cli import args_to_config, build_parser

        conf = args_to_config(build_parser().parse_args(
            ["-i", "in.ts", "-o", "out"] + args))
        assert conf.filter_mode == "kfm_vfr"
        assert conf.post_filter == "deblock,nr,deband"
        assert (conf.resize_width, conf.resize_height) == (1280, 720)
        assert conf.kfm_ucf is False

    def test_profile_roundtrip_and_make_args(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            prof = dict(server.profiles["default"].__dict__)
            prof["name"] = "structured"
            prof["filter_setting"] = {
                "enable_deinterlace": True,
                "deinterlace_algorithm": "AutoVfr",
                "auto_vfr_parallel": 4,
                "enable_edge_level": True,
            }
            await server.handle_request("SetProfile", prof)
            entry = type("E", (), {"src_path": str(tmp_path / "a.ts"),
                                   "out_path": str(tmp_path / "o"),
                                   "profile_name": "structured",
                                   "service_id": -1})()
            args = server.make_cli_args(entry,
                                        server.profiles["structured"])
            assert "--filter-mode" in args
            assert args[args.index("--filter-mode") + 1] == "autovfr"
            assert args[args.index("--autovfr-parallel") + 1] == "4"
            assert args[args.index("--post-filter") + 1] == "edge"
            # DRCS map rides along unconditionally (ref EncodeServer.cs
            # :1240-1242) so encodes feed the DRCSManager workflow
            import os as _os
            drcs = args[args.index("--drcs") + 1]
            assert drcs == _os.path.join(server.drcs_dir(), "drcs_map.txt")
            assert _os.path.isdir(server.drcs_dir())
            assert "--ignore-no-drcsmap" not in args
            prof["name"] = "nodrcs"
            prof["ignore_no_drcs_map"] = True
            await server.handle_request("SetProfile", prof)
            args2 = server.make_cli_args(entry, server.profiles["nodrcs"])
            assert "--ignore-no-drcsmap" in args2

        run(main())


class TestServiceLogoAutoSelect:
    """Per-service logo auto-selection: .lgd files in the logo directory
    are matched to queue items by the service id in their header (ref
    EncodeServer's ServiceSettings/LogoSettings + MakeAmatsukazeArgs)."""

    def _lgd(self, path, service_id):
        import numpy as np

        from amatsukaze_tpu.models.lgd import (
            LogoData,
            LogoHeader,
            save_lgd,
        )

        header = LogoHeader(8, 8, 1, 1, 64, 48, 0, 0, "svc", service_id)
        logo = LogoData.create(header)
        logo.a_y[:] = 1.0
        save_lgd(path, logo)

    def test_logo_matched_by_service_id(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            self._lgd(os.path.join(server.logo_dir(), "a.lgd"), 1024)
            self._lgd(os.path.join(server.logo_dir(), "b.lgd"), 1032)
            entry = type("E", (), {"src_path": "x.ts", "out_path": "o",
                                   "profile_name": "default",
                                   "service_id": 1024})()
            args = server.make_cli_args(entry, server.profiles["default"])
            logos = [args[i + 1] for i, a in enumerate(args) if a == "--logo"]
            assert len(logos) == 1 and logos[0].endswith("a.lgd")
            # other service picks the other logo
            entry.service_id = 1032
            args = server.make_cli_args(entry, server.profiles["default"])
            logos = [args[i + 1] for i, a in enumerate(args) if a == "--logo"]
            assert len(logos) == 1 and logos[0].endswith("b.lgd")
            # unknown service: none
            entry.service_id = 9
            args = server.make_cli_args(entry, server.profiles["default"])
            assert "--logo" not in args

        run(main())


class TestServicesView:
    def test_get_services_aggregates(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            TestServiceLogoAutoSelect()._lgd(
                os.path.join(server.logo_dir(), "nhk.lgd"), 1024)
            e = server.add_queue(str(tmp_path / "a.ts"),
                                 str(tmp_path / "o"), "default",
                                 service_id=1024)
            e.service_name = "NHK G"
            svcs = await server.handle_request("GetServices", {})
            assert svcs == [{"service_id": 1024, "name": "NHK G",
                             "logos": ["nhk.lgd"], "setting": {}}]

        run(main())

    def test_service_setting_rpc_and_args(self, ctx, tmp_path):
        """Per-service settings (ref ServiceSettingElement +
        TranscodeWorker.cs:715-732/:884-892): logo enable + validity
        period filter the --logo list by the item's recording time, an
        enabled NO_LOGO sentinel forces --ignore-no-logo, and disabling
        DisableCMCheck routes the JLS command/option into the args
        (profile command file wins over the service's)."""

        def entry_for(server, sid, ts_time=""):
            e = server.add_queue(str(tmp_path / "a.ts"),
                                 str(tmp_path / "o"), "default",
                                 service_id=sid)
            e.ts_time = ts_time
            return e

        async def main():
            from amatsukaze_tpu.server.server import NO_LOGO, EncodeServer

            data = str(tmp_path / "d")
            server = EncodeServer(ctx, data_dir=data)
            lgd = TestServiceLogoAutoSelect()._lgd
            lgd(os.path.join(server.logo_dir(), "old.lgd"), 1024)
            lgd(os.path.join(server.logo_dir(), "new.lgd"), 1024)
            prof = server.profiles["default"]
            prof.ignore_no_logo = False

            r = await server.handle_request("SetServiceSetting", {
                "service_id": 1024,
                "disable_cm_check": False,
                "jls_command": "JL_svc.txt",
                "jls_option": "-svcopt",
                "logo_settings": [
                    {"file_name": "old.lgd", "enabled": True,
                     "from": "", "to": "2020-04-01T00:00:00"},
                    {"file_name": "new.lgd", "enabled": True,
                     "from": "2020-04-01T00:00:00", "to": ""},
                    {"file_name": NO_LOGO, "enabled": False},
                ],
            })
            assert r["ok"]

            def logos(e):
                args = server.make_cli_args(e, prof)
                return ([args[i + 1] for i, a in enumerate(args)
                         if a == "--logo"], args)

            # recording before the switchover uses the old logo only
            ls, args = logos(entry_for(server, 1024,
                                       "2019-12-31T21:00:00"))
            assert len(ls) == 1 and ls[0].endswith("old.lgd")
            assert "--ignore-no-logo" not in args
            # JLS command flows because CM check is enabled
            assert args[args.index("--jls-cmd") + 1] == "JL_svc.txt"
            assert args[args.index("--jls-option") + 1] == "-svcopt"
            # after the switchover: the new logo
            ls, _ = logos(entry_for(server, 1024, "2021-01-01T21:00:00"))
            assert len(ls) == 1 and ls[0].endswith("new.lgd")
            # unknown recording time: every enabled logo qualifies
            ls, _ = logos(entry_for(server, 1024))
            assert len(ls) == 2

            # profile JLS command file wins over the service's
            prof.jls_command_file = "JL_profile.txt"
            _, args = logos(entry_for(server, 1024))
            assert args[args.index("--jls-cmd") + 1] == "JL_profile.txt"
            prof.jls_command_file = ""

            # enabled NO_LOGO sentinel makes the logo optional
            await server.handle_request("SetServiceSetting", {
                "service_id": 1024,
                "logo_settings": [
                    {"file_name": "old.lgd", "enabled": False},
                    {"file_name": "new.lgd", "enabled": False},
                    {"file_name": NO_LOGO, "enabled": True},
                ],
            })
            ls, args = logos(entry_for(server, 1024))
            assert ls == [] and "--ignore-no-logo" in args
            # disable_cm_check defaulted back to True: no JLS args
            assert "--jls-cmd" not in args

            # settings persist across a server restart
            server.save_app_data()
            server2 = EncodeServer(ctx, data_dir=data)
            server2.load_app_data()
            assert 1024 in server2.service_settings
            assert (server2.service_settings[1024]["logo_settings"][2]
                    ["file_name"] == NO_LOGO)
            # and GetServices reports them
            svcs = await server2.handle_request("GetServices", {})
            svc = [s for s in svcs if s["service_id"] == 1024][0]
            assert svc["setting"]["logo_settings"][2]["enabled"]

        run(main())


class TestRpcFuzz:
    """Malformed-payload sweep over the whole RPC surface: every method
    must respond (a result or a clean error) — never crash the server
    or leave it unable to serve the next request.  The web client and
    third-party tools (AddTask, ScriptCommand analogs) reach these
    handlers with arbitrary JSON, so type confusion must be contained
    at the dispatch boundary."""

    METHODS = [
        "AddQueue", "GetQueue", "GetGenreTable", "GetLogs", "GetLogFile",
        "PauseEncode", "SetProfile", "GetProfiles", "PreviewFilter",
        "RemoveProfile", "SetNumParallel", "CancelItem", "ChangeItem",
        "AddTag", "SetPriority", "GetOutFiles", "RetryItem",
        "GetDiskSpace", "GetConsole", "SetFinishAction", "CancelSleep",
        "CancelAddQueue", "GetSetting", "SetSetting", "GetServices",
        "SetServiceSetting", "GetAutoSelect", "SetAutoSelect", "GetState",
        "GetDrcsImages", "AddDrcsMapping", "GetLogoFiles", "RenameLogo",
        "ScanLogo", "NoSuchMethod",
    ]
    # EndServer excluded: it legitimately stops the server

    PAYLOADS = [
        {},
        None,
        {"src": 123, "item_id": "x", "profile": None, "priority": "hi"},
        {"src": "", "out": "", "name": "", "md5": "", "item_id": -1},
        {"src": "/nonexistent/x.ts", "item_id": 10**9, "type": "bogus",
         "priority": 99, "profile": "\x00" * 64, "rect": [1]},
        {"k" * 512: "v" * 4096, "payload": {"nested": [1, {"a": None}]}},
    ]

    def test_all_methods_survive_garbage(self, ctx, tmp_path):
        async def main():
            from amatsukaze_tpu.server.server import EncodeServer

            async def ok_run(server, wid, entry, phase):
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            await server.start(port=0)
            crashes = []
            for m in self.METHODS:
                for p in self.PAYLOADS:
                    try:
                        await server.handle_request(m, p)
                    except asyncio.CancelledError:
                        raise
                    except Exception:  # noqa: BLE001 - clean errors OK
                        pass
                    # the server must still answer a well-formed request
                    try:
                        st = await server.handle_request("GetState", {})
                        assert "paused" in st
                    except Exception as e:  # noqa: BLE001
                        crashes.append((m, repr(p)[:60], repr(e)[:80]))
            assert not crashes, crashes
            await server.stop()

        run(main())


class TestOpsChurn:
    """Randomized concurrent-operation churn against a live server:
    add/cancel/retry/pause/priority/parallelism ops interleave with
    running workers (some of which fail synthetically), and every
    queue item must still reach a terminal state — no stuck items, no
    unexpected exceptions.  (A longer sweep of this harness found the
    ClientManager.broadcast set-mutation crash in round 5.)"""

    async def _churn(self, ctx, seed, tmp_path):
        import random

        from amatsukaze_tpu.server.server import EncodeServer

        rng = random.Random(seed)

        async def run_item(server, wid, entry, phase):
            for name in ("TSAnalyze", "CMAnalyze", "Filter",
                         "Encode", "Mux"):
                await phase.wait_async(name)
                await asyncio.sleep(rng.random() * 0.005)
            if rng.random() < 0.3:
                raise RuntimeError("synthetic encode failure")
            return True

        server = EncodeServer(ctx, data_dir=str(tmp_path / f"d{seed}"),
                              run_item=run_item)
        server.setting.num_parallel = rng.choice([1, 2, 3])
        await server.start(port=0)
        src = tmp_path / "s.ts"
        src.write_bytes(b"G" + bytes(187))
        ids = []
        for i in range(60):
            op = rng.random()
            try:
                if op < 0.3 or not ids:
                    r = await server.handle_request(
                        "AddQueue", {"src": str(src),
                                     "out": str(tmp_path / f"o{seed}_{i}")})
                    ids.append(r["item_id"])
                elif op < 0.4:
                    await server.handle_request(
                        "CancelItem", {"item_id": rng.choice(ids)})
                elif op < 0.5:
                    await server.handle_request(
                        "RetryItem", {"item_id": rng.choice(ids)})
                elif op < 0.6:
                    await server.handle_request(
                        "PauseEncode", {"pause": rng.random() < 0.5})
                elif op < 0.7:
                    await server.handle_request(
                        "ChangeItem",
                        {"item_id": rng.choice(ids),
                         "type": rng.choice(["priority", "movetop",
                                             "duplicate", "remove"]),
                         "priority": rng.randrange(1, 6)})
                elif op < 0.8:
                    await server.handle_request(
                        "SetNumParallel", {"n": rng.choice([1, 2, 4])})
                else:
                    await server.handle_request("GetState", {})
                    await server.handle_request("GetQueue", {})
            except Exception as e:  # noqa: BLE001 - item-gone races OK
                if "item" not in str(e).lower():
                    raise
            await asyncio.sleep(rng.random() * 0.01)
        await server.handle_request("PauseEncode", {"pause": False})
        for _ in range(600):
            states = {e.state for e in server.entries.values()}
            if states <= {"complete", "failed", "canceled"}:
                break
            await asyncio.sleep(0.05)
        stuck = [(e.item_id, e.state) for e in server.entries.values()
                 if e.state not in ("complete", "failed", "canceled")]
        await server.stop()
        assert not stuck, (seed, stuck)

    def test_churn_seeds(self, ctx, tmp_path):
        async def main():
            for seed in (100, 107, 113, 121, 128, 135):
                await self._churn(ctx, seed, tmp_path)

        run(main())


class TestPauseScheduler:
    """Time-window scheduled pausing (ref Server/PauseScheduler.cs):
    a pause_windows setting covering the current hour pauses the pool
    (separately from user pause), clearing it resumes, and a
    wrap-around window (e.g. [23, 6]) is honored."""

    def test_window_pauses_and_clears(self, ctx, tmp_path):
        async def main():
            import time as _time

            from amatsukaze_tpu.server.server import EncodeServer

            async def ok_run(server, wid, entry, phase):
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            await server.start(port=0)
            hour = _time.localtime().tm_hour
            await server.handle_request(
                "SetSetting",
                {"pause_windows": [[hour, (hour + 1) % 24]]})
            for _ in range(100):  # scheduler's first tick is immediate
                if server.pool.scheduled_paused:
                    break
                await asyncio.sleep(0.02)
            st = await server.handle_request("GetState", {})
            assert st["scheduled_paused"] is True
            assert st["paused"] is True
            # user pause state is independent
            await server.handle_request("PauseEncode", {"pause": False})
            assert server.pool.scheduled_paused is True
            # clearing the windows resumes promptly
            await server.handle_request("SetSetting", {"pause_windows": []})
            st = await server.handle_request("GetState", {})
            assert st["scheduled_paused"] is False
            assert st["paused"] is False
            # wrap-around window logic
            from amatsukaze_tpu.server.server import PauseScheduler
            ps = PauseScheduler(server.pool, [(23, 6)])
            assert ps._in_window(23) and ps._in_window(2)
            assert not ps._in_window(12)
            # malformed values are rejected BEFORE committing (a bad
            # persisted value would otherwise brick every startup)
            for bad in ([[23]], "23-6", [["a", "b"]], [[25, 3]]):
                r = await server.handle_request(
                    "SetSetting", {"pause_windows": bad})
                assert r["ok"] is False, bad
            assert server.setting.pause_windows == []
            # end hour 24 = until midnight, normalized to 0
            r = await server.handle_request(
                "SetSetting", {"pause_windows": [[22, 24]]})
            assert r["ok"] is True
            assert server.setting.pause_windows == [[22, 0]]
            await server.stop()
            # a hand-corrupted persisted value must not brick startup
            import json as _json
            sj = tmp_path / "d" / "setting.json"
            data = _json.loads(sj.read_text())
            data["pause_windows"] = [[99]]
            sj.write_text(_json.dumps(data))
            server2 = EncodeServer(ctx, data_dir=str(tmp_path / "d"))
            await server2.start(port=0)  # boots; bad value dropped
            assert server2.setting.pause_windows == []
            await server2.stop()

        run(main())


class TestUserScriptHooks:
    """Profile pre/post/add user scripts run around each item with the
    ITEM_* environment and the result env on post (ref
    UserScriptExecuter.cs via tools/user_script; wired through
    ProfileSetting Pre/Post/AddBatFile)."""

    def test_bats_fire_with_env(self, ctx, tmp_path):
        async def main():
            import stat as _stat

            from amatsukaze_tpu.server.server import EncodeServer

            log = tmp_path / "hooks.log"
            for phase in ("pre", "post", "add"):
                sc = tmp_path / f"{phase}.sh"
                sc.write_text(
                    "#!/bin/bash\n"
                    f'echo "{phase} id=$ITEM_ID mode=$ITEM_MODE '
                    'succ=${SUCCESS:-} port=$AMT_SERVER_PORT" >> '
                    f'"{log}"\n')
                sc.chmod(sc.stat().st_mode | _stat.S_IEXEC)

            async def ok_run(server, wid, entry, phase):
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            await server.start(port=0)
            await server.handle_request("SetProfile", {
                "name": "default",
                "pre_bat_file": str(tmp_path / "pre.sh"),
                "post_bat_file": str(tmp_path / "post.sh"),
                "add_bat_file": str(tmp_path / "add.sh")})
            src = tmp_path / "a.ts"
            src.write_bytes(b"G" + bytes(187))
            r = await server.handle_request(
                "AddQueue", {"src": str(src),
                             "out": str(tmp_path / "o")})
            iid = r["item_id"]
            for _ in range(300):
                await asyncio.sleep(0.02)
                e = server.entries[iid]
                if e.state in ("complete", "failed") \
                        and log.exists() and "post" in log.read_text():
                    break
            text = log.read_text()
            assert f"add id={iid} mode=add succ=" in text
            assert f"pre id={iid} mode=pre succ=" in text
            assert f"post id={iid} mode=post succ=1" in text
            assert "port=0" not in text  # callback port is the real one
            await server.stop()

        run(main())

    def test_script_command_callback_tags_item(self, ctx, tmp_path):
        """A pre script can call back into the live server through the
        script_command tool (ref ScriptCommand/Program.cs via the env
        pipe analog): AddTag from inside the script lands on the item."""
        async def main():
            import stat as _stat
            import sys as _sys

            from amatsukaze_tpu.server.server import EncodeServer

            sc = tmp_path / "pre.sh"
            sc.write_text(
                "#!/bin/bash\n"
                f'"{_sys.executable}" -m amatsukaze_tpu.tools.'
                'script_command AddTag from-script\n')
            sc.chmod(sc.stat().st_mode | _stat.S_IEXEC)

            async def ok_run(server, wid, entry, phase):
                return True

            server = EncodeServer(ctx, data_dir=str(tmp_path / "d"),
                                  run_item=ok_run)
            await server.start(port=0)
            await server.handle_request("SetProfile", {
                "name": "default", "pre_bat_file": str(sc)})
            src = tmp_path / "a.ts"
            src.write_bytes(b"G" + bytes(187))
            r = await server.handle_request(
                "AddQueue", {"src": str(src),
                             "out": str(tmp_path / "o")})
            iid = r["item_id"]
            for _ in range(400):
                await asyncio.sleep(0.02)
                if server.entries[iid].state in ("complete", "failed"):
                    break
            assert "from-script" in server.entries[iid].tags
            await server.stop()

        run(main())
