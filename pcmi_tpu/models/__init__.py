"""Flax model zoo + training loops."""

from pcmi_tpu.models.unet import (
    DIPUNet,
    InpaintUNet,
    PatchDiscriminator,
    SRUNet,
    bicubic_upsample,
)
from pcmi_tpu.models.dip import DIPConfig, DIPEngine
from pcmi_tpu.models.training import (
    InpaintGANTrainer,
    InpaintTrainConfig,
    SRGANTrainer,
    SRTrainConfig,
    data_parallel_step,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = [
    "DIPUNet",
    "InpaintUNet",
    "PatchDiscriminator",
    "SRUNet",
    "bicubic_upsample",
    "DIPConfig",
    "DIPEngine",
    "InpaintGANTrainer",
    "InpaintTrainConfig",
    "SRGANTrainer",
    "SRTrainConfig",
    "data_parallel_step",
    "restore_checkpoint",
    "save_checkpoint",
]
