from .deeplabv3plus import DeepLabV3Plus
from .unetplusplus import UnetPlusPlus
