module github.com/cuvs-tpu/go

go 1.21
