from . import pgm, telemetry
from .telemetry import Telemetry

__all__ = ["pgm", "telemetry", "Telemetry"]
