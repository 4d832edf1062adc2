"""Version information for torchsr-tpu.

Mirrors the role of the reference's ``torchsr/__version__.py``
(/root/reference/torchsr/__version__.py:1-13) but versions the TPU-native
rebuild independently.
"""

MAJOR = 0
MINOR = 1
PATCH = 0

VERSION = f"{MAJOR}.{MINOR}.{PATCH}"
