"""Headless encode-server host (ref AmatsukazeServerCLI/ServerCLI.cs:8-50).

Runs the EncodeServer's TCP RPC endpoint plus the browser client
(``server/web.py``) until interrupted:

    python -m amatsukaze_tpu.server.cli --data ./data --port 32768 --web-port 8080
"""

from __future__ import annotations

import argparse
import asyncio

from ..utils.context import AMTContext
from .server import EncodeServer
from .web import WebServer


async def serve(args) -> None:
    if args.host not in ("127.0.0.1", "localhost", "::1"):
        print("WARNING: binding RPC + web UI to a non-loopback host "
              f"({args.host}). Anyone who can reach these ports can "
              "manage the encode queue and server settings — only do "
              "this on a trusted network.")
    ctx = AMTContext()
    server = EncodeServer(ctx, data_dir=args.data)
    port = await server.start(host=args.host, port=args.port)
    print(f"RPC listening on {args.host}:{port}")
    web = None
    if args.web_port >= 0:
        web = WebServer(server)
        wport = await web.start(host=args.host, port=args.web_port)
        print(f"Web client on http://{args.host}:{wport}/")
    try:
        # run until interrupted or an EndServer RPC arrives (ref
        # ServerCLI.cs finishRequested wait)
        while not server.end_requested.is_set():
            try:
                await asyncio.wait_for(server.end_requested.wait(), 60)
            except asyncio.TimeoutError:
                server.save_app_data()
    except asyncio.CancelledError:
        pass
    finally:
        if web is not None:
            await web.stop()
        await server.stop()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="amatsukaze-server")
    p.add_argument("--data", default="./data", help="app data directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=32768, help="RPC port")
    p.add_argument("--web-port", type=int, default=8080,
                   help="web client port (-1 disables)")
    args = p.parse_args(argv)
    try:
        asyncio.run(serve(args))
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
