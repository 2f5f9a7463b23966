"""ETL pipeline layer: YAML config -> spark.read -> catalog -> compiled
queries -> df.write (SURVEY.md §3.2; reference: cli/pipeline.py,
ingestion/config.py). The reference's out-of-core "relation engine"
special path disappears — Spark's lazy execution is always out-of-core.
"""

from pycypher_nmetl_spark.pipeline.config import PipelineConfig, load_config
from pycypher_nmetl_spark.pipeline.runner import run_pipeline
from pycypher_nmetl_spark.pipeline.sources import read_source
from pycypher_nmetl_spark.pipeline.writer import write_output

__all__ = ["PipelineConfig", "load_config", "run_pipeline", "read_source", "write_output"]
