from aread_tpu.serve.predictor import Predictor, load_predictor  # noqa: F401
