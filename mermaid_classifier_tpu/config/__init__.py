"""Config & settings layer (reference layer L2: settings.py, options.py,
sagemaker/config.py)."""
