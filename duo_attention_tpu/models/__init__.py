from . import llama
