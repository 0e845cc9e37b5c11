"""Encode server: queue, profiles, scheduling, RPC (reference:
AmatsukazeServer/Server/* -> asyncio TCP with JSON frames)."""
