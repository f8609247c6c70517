"""Web service layer: config, EQ files, daemon access."""
