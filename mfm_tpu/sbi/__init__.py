from mfm_tpu.sbi.snpe import SNPE, SNPE_A, simulator

__all__ = ["SNPE", "SNPE_A", "simulator"]
