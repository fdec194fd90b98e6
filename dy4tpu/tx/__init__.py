"""Signal synthesis: FM stereo+RDS multiplex transmitter and test tones."""
from dy4tpu.tx import fm  # noqa: F401
