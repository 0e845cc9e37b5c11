"""Model layer: logo generation/matching, CM analysis, KFM-style VFR.

These orchestrate the device kernels in ``amatsukaze_tpu.ops`` and carry the
host-side decision logic that must stay decision-identical to the reference.
"""
