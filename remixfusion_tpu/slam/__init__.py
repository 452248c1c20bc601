from remixfusion_tpu.slam.pipeline import RemixFusionTPU  # noqa: F401
