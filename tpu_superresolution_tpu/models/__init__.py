"""Model zoo.  Importing this package registers all builders."""

from tpu_superresolution_tpu.models import msresunet  # noqa: F401
from tpu_superresolution_tpu.models import unet2d  # noqa: F401

from tpu_superresolution_tpu.models.msresunet import MSResUNet, build_msresunet
from tpu_superresolution_tpu.models.unet2d import UNet2D, build_unet2d

try:  # transformer families land incrementally
    from tpu_superresolution_tpu.models import swinir  # noqa: F401
    from tpu_superresolution_tpu.models.swinir import SwinIR, build_swinir
except ImportError:  # pragma: no cover
    pass
try:
    from tpu_superresolution_tpu.models import hat  # noqa: F401
    from tpu_superresolution_tpu.models.hat import HAT, build_hat
except ImportError:  # pragma: no cover
    pass
try:
    from tpu_superresolution_tpu.models import dat  # noqa: F401
    from tpu_superresolution_tpu.models.dat import DAT, build_dat
except ImportError:  # pragma: no cover
    pass
