from .base import Game  # noqa: F401
from .single_room import SingleRoom  # noqa: F401
from .random_room import RandomRoom, RandomRoomConfig  # noqa: F401
from .maze import Maze, MazeConfig  # noqa: F401
