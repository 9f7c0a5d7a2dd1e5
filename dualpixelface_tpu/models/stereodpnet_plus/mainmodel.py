"""stereodpnet_plus — reserved placeholder, mirroring the reference's empty
`src/model/stereodpnet_plus/` stub (0-byte mainmodel/modules, '{}' config)."""
