from .irse import IRSETrunk, BottleneckIRSE, PReLU, torch_conv  # noqa: F401
from .e4e import Encoder4Editing, E4E, LatentCodesDiscriminator  # noqa: F401
from .unet_encoders import (  # noqa: F401
    ConvGRU,
    TriPlanefeatEncoder,
    TriPlaneSFTfeatEncoder,
)
from .uvnet import InversionNet  # noqa: F401
