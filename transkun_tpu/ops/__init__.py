from . import semicrf
from .semicrf import NeuralSemiCRFInterval
