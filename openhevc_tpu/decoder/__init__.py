from .frontend import Frontend
