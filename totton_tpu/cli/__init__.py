"""Command-line entry points (streamer, control daemon, web server)."""
