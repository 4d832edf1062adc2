"""``python -m torchsr_tpu`` entrypoint."""

from torchsr_tpu.cli import main

if __name__ == "__main__":
    main()
