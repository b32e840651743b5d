from .base import Game  # noqa: F401
from .single_room import SingleRoom  # noqa: F401
