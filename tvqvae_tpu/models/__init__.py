from .vq import (
    CodebookState,
    VQOutput,
    VQParams,
    init_codebook,
    kmeans,
    lookup_codes,
    vq_forward,
)
from .vqvae import TimeHead, VQVAEDecoder, VQVAEEncoder
from .stage1 import (
    Stage1Model,
    Stage1Output,
    Stage1Spec,
    init_stage1,
    stage1_losses,
)
from .fcn import FCN

__all__ = [
    "CodebookState",
    "VQOutput",
    "VQParams",
    "init_codebook",
    "kmeans",
    "lookup_codes",
    "vq_forward",
    "TimeHead",
    "VQVAEDecoder",
    "VQVAEEncoder",
    "Stage1Model",
    "Stage1Output",
    "Stage1Spec",
    "init_stage1",
    "stage1_losses",
    "FCN",
]
