"""Model zoo: flagship FEAM 3D U-Net, ablation variants, refiner, discriminators."""

from multimodal_pl_tpu.models.blocks import WSConv3d, GNReLUConv, NoBottleneck, ResStage
from multimodal_pl_tpu.models.eam import EAM, EAMIdentity, EAMBK
from multimodal_pl_tpu.models.unet3d import (
    UNet3DFEAM,
    UNet3DDeepSup,
    UNet3DEAM,
    UNet3DBaseline,
    UNet3DDynHead,
)
from multimodal_pl_tpu.models.refiner import RefinerUNet3D
from multimodal_pl_tpu.models.discriminator import (
    DeepStyleDiscriminator,
    NormStyleDiscriminator,
    StyleDiscriminatorOutput,
    StyleDiscriminatorLinear,
)
from multimodal_pl_tpu.models.tokens import init_class_tokens, renew_tokens
