"""Serving layer: GenerationService + stdlib HTTP front end.

The reference has no working deployment path (README.md:99-104 describes a
`deployment/` dir absent from its snapshot); this package is the
framework-native one. See scripts/serve.py for the CLI.
"""

from tvqvae_tpu.serving.server import make_server, serve_forever
from tvqvae_tpu.serving.service import GenerationService

__all__ = ["GenerationService", "make_server", "serve_forever"]
