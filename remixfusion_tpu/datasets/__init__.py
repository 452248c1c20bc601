from remixfusion_tpu.datasets.factory import get_dataset  # noqa: F401
