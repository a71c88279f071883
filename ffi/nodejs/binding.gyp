{
  "targets": [
    {
      "target_name": "cozo_node",
      "sources": ["addon.c"],
      "libraries": ["-L<(module_root_dir)/../../native", "-lcozo_c"],
      "include_dirs": ["../../native"]
    }
  ]
}
