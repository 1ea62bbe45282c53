# xview2_tpu — TPU-native xView2 framework.
# The runtime expects a JAX TPU environment (libtpu preinstalled on TPU VMs).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make libpng-dev libjpeg62-turbo-dev zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/xview2_tpu
COPY . .
RUN pip install --no-cache-dir "jax[tpu]" flax optax orbax-checkpoint chex \
        numpy pillow pandas scipy joblib pytest \
    && ./native/build.sh \
    && pip install --no-cache-dir -e .

ENTRYPOINT ["python", "-m", "xview2_tpu.main"]
