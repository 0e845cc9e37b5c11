"""Parallel layer: device-mesh sharding for the frame pipeline + the
resource-aware job scheduler (reference: AmatsukazeServer/Server/Scheduler.cs,
ResourceManager.cs -> asyncio; NCCL-free frame-axis sharding -> shard_map).
"""
