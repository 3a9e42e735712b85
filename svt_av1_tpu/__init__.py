"""svt_av1_tpu — a TPU-native AV1 encode/decode engine.

A from-scratch reimplementation of the capability set of SVT-AV1 (v0.8.6,
see /root/reference) designed for TPU hardware: batched JAX/Pallas kernels
over superblock grids for the compute path (transforms, quantization,
prediction, motion search, in-loop filters), a host-side async pipeline
orchestrator in place of the reference's 16-stage thread-pool fabric
(reference: Source/Lib/Encoder/Globals/EbEncHandle.c), and jax.sharding
meshes for multi-chip/multi-host scale-out in place of shared-memory FIFOs
(reference: Source/Lib/Common/Codec/EbSystemResourceManager.c).

Layout:
  config.py    encoder/decoder configuration + presets (ref: EbSvtAv1Enc.h)
  constants.py AV1 enums and geometry constants (ref: EbDefinitions.h)
  io/          Y4M/YUV frame I/O, IVF/OBU containers (ref: Source/App)
  entropy/     multisymbol range coder, CDF models (ref: EbBitstreamUnit.c,
               EbCabacContextModel.c)
  bitstream/   OBU syntax: sequence/frame headers, tile groups
               (ref: EbEntropyCoding.c, EbDecParseObu.c)
  ops/         batched TPU kernels: transforms, quant, intra/inter
               prediction, SAD, filters (ref: ASM_* DSP layer)
  pipeline/    encoder stage orchestration (ref: Eb*Process.c)
  decoder/     conformant decoder: parse -> recon (ref: Source/Lib/Decoder)
  parallel/    mesh/sharding utilities (SB-tile sharding, GOP sharding)
  utils/       logging, timing, md5 helpers
"""

__version__ = "0.1.0"
