from .packet import TS_PACKET_LENGTH, TsPacket, TsPacketParser
from .pes import PESPacket, PesParser
from .psi import PsiParser, PsiSection, PAT, PMT
from .splitter import TsSplitter, TsSystemClock

__all__ = [
    "TS_PACKET_LENGTH",
    "TsPacket",
    "TsPacketParser",
    "PESPacket",
    "PesParser",
    "PsiParser",
    "PsiSection",
    "PAT",
    "PMT",
    "TsSplitter",
    "TsSystemClock",
]
