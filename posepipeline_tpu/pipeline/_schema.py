"""The shared schema namespace for all pipeline tables.

Reference: ``schema = dj.schema(db_prefix + "pose_pipeline")`` at
pose_pipeline/pipeline.py:15-20. Tables declare against this module's
``schema`` object; the database prefix comes from the config like the
reference's ``custom.database.prefix``.
"""

from ..core.config import config
from ..core.engine import Schema

schema = Schema(config.database_prefix + "pose_pipeline")
