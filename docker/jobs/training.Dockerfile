# Training image: CPU/TPU head training + ETL (reference analog:
# docker/jobs/training.Dockerfile). The TPU runtime libs come from the host
# plugin on TPU VMs; this image carries the framework + training lane.
FROM python:3.12-slim

# g++ for the native fastbatch batch gatherer (built on first use).
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/app

# Dependency layer first so code changes don't bust the cache
# (reference: training.Dockerfile layer-caching discipline).
COPY pyproject.toml ./
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir \
    flax optax scipy pandas pyarrow pydantic pydantic-settings psutil \
    matplotlib pyyaml jinja2 pillow

COPY mermaid_classifier_tpu/ mermaid_classifier_tpu/
COPY scripts/ scripts/
COPY docker/jobs/training-entrypoint.sh /usr/local/bin/training-entrypoint.sh
RUN chmod +x /usr/local/bin/training-entrypoint.sh \
    && pip install --no-cache-dir -e ".[training]"

ENV PYTHONUNBUFFERED=1
ENTRYPOINT ["/usr/local/bin/training-entrypoint.sh"]
