from .bits import BitReader, BitWriter
from .crc import crc32_mpeg2, CRC32_TABLE
from .context import AMTContext, AMTError, ErrorCounter

__all__ = [
    "BitReader",
    "BitWriter",
    "crc32_mpeg2",
    "CRC32_TABLE",
    "AMTContext",
    "AMTError",
    "ErrorCounter",
]
