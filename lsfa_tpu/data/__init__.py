from lsfa_tpu.data import coviar  # noqa: F401
from lsfa_tpu.data.image import resize, transform, transform_mv_res  # noqa: F401
