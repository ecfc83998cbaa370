# drivers registered below once implemented

