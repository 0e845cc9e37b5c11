"""Amatsukaze-TPU: TPU-native automated MPEG2-TS transcoding framework.

A from-scratch rebuild of the capabilities of nekopanda/Amatsukaze
(reference layout documented in SURVEY.md):

- ``utils``    : bit I/O, CRC32, context/logging, perf (ref: Amatsukaze/StreamUtils.hpp,
                 CoreUtils.hpp, PerformanceUtil.hpp)
- ``ts``       : MPEG2-TS demux - packets, PSI, PES, ES parsers, splitter
                 (ref: Mpeg2TsParser.hpp, TsSplitter.hpp, *VideoParser.hpp, AdtsParser.hpp)
- ``reform``   : timeline reconstruction (ref: StreamReform.hpp)
- ``ops``      : JAX/Pallas device kernels - logo, deinterlace, telecine, denoise, CM metrics
                 (ref: LogoScan.hpp compute, ComputeKernel.cpp, K* filter semantics)
- ``models``   : logo analyzer/matcher, CM analysis, KFM-style VFR pipeline
                 (ref: LogoScan.hpp, CMAnalyze.hpp, FilteredSource.hpp)
- ``parallel`` : device-mesh sharding + resource-aware job scheduler
                 (ref: AmatsukazeServer/Server/Scheduler.cs, ResourceManager.cs)
- ``io``       : y4m, wave, encoder/muxer subprocess drivers (ref: Encoder.hpp, Muxer.hpp)
- ``pipeline`` : CLI orchestration, config, temp-file scheme (ref: TranscodeManager.hpp,
                 TranscodeSetting.hpp, AmatsukazeCLI.hpp)
- ``captions`` : ARIB caption decode + ASS/SRT formatting (ref: AribString.hpp,
                 CaptionData.hpp, CaptionFormatter.hpp)
- ``server``   : encode server - queue, profiles, RPC (ref: AmatsukazeServer/)
"""

__version__ = "0.1.0"
