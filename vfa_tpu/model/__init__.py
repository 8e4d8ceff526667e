from vfa_tpu.model.vfanet import VFANet  # noqa: F401
