"""Default configuration constants.

Capability parity with the reference defaults
(/root/reference/torchsr/constants.py:13-19).
"""

BATCH_SIZE = 64
EPOCHS = 1000
PRE_EPOCHS = 1000

TRAIN_DIR = "dataset"

MODEL = "ESRGAN"

# Fixed upscale factor of the model families (two x2 upsampling stages; see
# reference srgan/generator.py:33-35 and esrgan/generator.py:73-78).
UPSCALE_FACTOR = 4

# Supported image extensions for dataset discovery
# (reference dataset.py:29).
SUPPORTED_IMAGES = (".jpg", ".jpeg", ".png")
