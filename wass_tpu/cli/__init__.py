from wass_tpu.cli.pipeline import SequencePipeline, SequenceConfig  # noqa: F401
