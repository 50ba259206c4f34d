from scanobjectnn_tpu.data import io, mappings, pipeline, splits, synthetic  # noqa: F401
