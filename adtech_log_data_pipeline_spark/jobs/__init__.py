from .bidlog_job import run_bidlog_job
from .prediction_job import run_prediction_job

__all__ = ["run_bidlog_job", "run_prediction_job"]
