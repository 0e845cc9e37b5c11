"""AddTask: submit a recording to the encode server (EDCB post-record hook).

Parity: AmatsukazeAddTask (AmatsukazeAddTask/AddTaskMain.cs:1-474): connect
to the server over TCP, AddQueue the file with profile/priority, optionally
copying to a NAS dir first (with SHA-512 recorded for the server's hash-dir
verification). Wake-on-LAN is out of scope in this environment.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

from ..server.rpc import RpcClient
from .hash_check import append_hash, copy_with_hash


async def add_task(host: str, port: int, src: str, out: str | None,
                   profile: str, priority: int, service_id: int,
                   nas_dir: str | None = None) -> dict:
    if nas_dir:
        os.makedirs(nas_dir, exist_ok=True)
        dst = os.path.join(nas_dir, os.path.basename(src))
        digest = copy_with_hash(src, dst)
        append_hash(os.path.join(nas_dir, "hash.txt"),
                    os.path.basename(src), digest)
        src = dst
    client = await RpcClient.connect(host, port)
    res = await client.call("AddQueue", {
        "src": src,
        "out": out or (os.path.splitext(src)[0] + ".out"),
        "profile": profile,
        "priority": priority,
        "service_id": service_id,
    })
    return res or {}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="amatsukaze-addtask")
    p.add_argument("src")
    p.add_argument("-o", "--out")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=32768)
    p.add_argument("-s", "--profile", default="default")
    p.add_argument("--priority", type=int, default=3)
    p.add_argument("--service-id", type=int, default=-1)
    p.add_argument("--nas-dir")
    args = p.parse_args(argv)
    res = asyncio.run(add_task(args.host, args.port, args.src, args.out,
                               args.profile, args.priority, args.service_id,
                               args.nas_dir))
    print(json.dumps(res, ensure_ascii=False))
    return 0 if "item_id" in res else 1


if __name__ == "__main__":
    raise SystemExit(main())
