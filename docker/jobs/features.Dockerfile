# Feature-extraction image for TPU workers (reference analog:
# docker/jobs/features.Dockerfile, which used a cuda base; the TPU image
# installs the libtpu-enabled jax wheel instead).
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/app

COPY pyproject.toml ./
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir flax pandas pyarrow pydantic-settings pyyaml pillow

COPY mermaid_classifier_tpu/ mermaid_classifier_tpu/
COPY scripts/ scripts/
COPY docker/jobs/features-entrypoint.sh /usr/local/bin/features-entrypoint.sh
RUN chmod +x /usr/local/bin/features-entrypoint.sh \
    && pip install --no-cache-dir -e .

ENV PYTHONUNBUFFERED=1
ENTRYPOINT ["/usr/local/bin/features-entrypoint.sh"]
