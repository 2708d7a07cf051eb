from .spec import GPSLCParams, ModelData, ModelSpec, make_model_data
from .state import field_shape, hyper_fields, init_from_prior
from . import blocks
